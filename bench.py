"""Benchmark: SW scoring throughput (GCUPS) on the available accelerator.

Workload: 32 LACI-length queries (360 aa) each scored against 256 padded
512-aa targets — one grid-of-groups Pallas launch per call, the shape
class of the pipeline's hot phase (SW rescoring of prefilter candidates,
reference database_alignment.cpp:21-127).  Cells are counted the
reference's way: sum over pairs of |q| x |t| true DP cells
(database_search.cpp:126,182).

Measurement rules learned on this platform (see align/pallas_sw.py):
* a unique input per call — repeated identical dispatches get deduplicated
  and overstate throughput ~10x;
* every call is followed by a host fetch (np.asarray) — block_until_ready
  does not actually block through the remote-attached runtime;
* no other large jitted programs run first in this process.

Baseline: the reference publishes no numbers (BASELINE.md) and its CUDA/C
compute library (swsharp) is an empty submodule, so the comparison point
is MEASURED on this machine each run: the repo's own threaded score-only
C++ DP (native/aligner.cpp sift4g_score_batch) at the same workload shape
— the closest thing to the reference's CPU build that actually exists
here.  vs_baseline is therefore measured-vs-measured.

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"} plus a
"baseline_gcups" field (the measured CPU number) and "roofline_pct" (the
kernel's share of the measured VPU peak — docs/PLATFORM.md "Roofline").

The record self-diagnoses relay-session health (VERDICT r3 item 1): a
slow relay session is visibly distinguishable from a slow kernel because
the JSON also carries
* "marginal_gcups" — the kernel's overhead-free rate, measured in-session
  with ONE compiled shape by varying the RUNTIME q_lens row count (the
  ~30 ms launch tax and the row-count-independent planes prologue cancel
  in the differential);
* "roofline_gcups" — the DP row-engine ceiling RE-PROBED in this same
  session (align/roofline.py), so "roofline_pct" divides same-session
  numbers instead of a frozen 2026-08-17 constant;
* the per-iteration spread ("gcups_iters") and the untimed warmup
  convergence trail ("warmup_trail").
Reading the record: value/roofline_pct low but marginal_roofline_pct
~97-100% => the kernel is at speed and the session's launch tax is
inflated; both low => a real kernel regression.
"""

import json
import os
import sys
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

FALLBACK_BASELINE_GCUPS = 0.83  # last measured native CPU (4-core host)


def bench_grouped_pallas(
    groups=64,
    batch=1024,
    n=512,
    m=360,
    iters=10,
    warmup_budget_s=90.0,
    warmup_max=10,
    m_lo=120,
    marginal_iters=5,
):
    """Launch-amortized + marginal GCUPS of the production grouped kernel.

    Returns a dict, not a float — the JSON record carries enough to tell a
    slow relay session from a slow kernel (see the module docstring).

    Warmup is a CONVERGENCE loop, not a fixed count: first-process
    launches through the relay run slow even post-compile (measured
    2026-08-18: 40.3 vs 48.3 GCUPS), and the round-3 official capture
    showed a fixed 3 warmups is not always enough — keep launching
    untimed (unique inputs) until the last 3 rates agree within 5% or the
    budget expires.

    The marginal rate reuses the SAME compiled shape: the row fori_loop
    bound is the runtime q_lens prefetch scalar, so calls at q_len=m vs
    q_len=m_lo differ only by (m - m_lo) DP rows — launch tax, planes
    prologue (row-count-independent), and fetch cancel in the time delta.
    """
    import jax.numpy as jnp

    from sift4g_tpu.align.pallas_sw import PAD_CODE, sw_scores_pallas_grouped
    from sift4g_tpu.align.xla import _extend_matrix
    from sift4g_tpu.core.scorers import create_scorer

    scorer = create_scorer("BLOSUM_62", 10, 1)
    m32 = jnp.asarray(_extend_matrix(scorer.matrix))
    rng = np.random.default_rng(42)

    m_pad = -(-m // 64) * 64
    q_all = np.full(groups * m_pad, PAD_CODE, dtype=np.int32)
    q_off = (np.arange(groups) * m_pad).astype(np.int32)
    for g in range(groups):
        q_all[g * m_pad : g * m_pad + m] = rng.integers(0, 26, m)
    lens = jnp.asarray(np.full((groups, batch), n, dtype=np.int32))
    qa, qo = jnp.asarray(q_all), jnp.asarray(q_off)
    qlen_hi = jnp.asarray(np.full(groups, m, dtype=np.int32))
    qlen_lo = jnp.asarray(np.full(groups, m_lo, dtype=np.int32))

    def new_slab():
        return jnp.asarray(rng.integers(0, 26, (groups, batch, n)).astype(np.int8))

    # static bounds kept for shape parity with production calls (they gate
    # the int16 path, which is dead on v5e — docs/PLATFORM.md); the kernel
    # runs int32 with the unroll=2 production default
    kw = dict(max_qlen=m_pad, max_sub=11)

    def call(qlen, t):
        return np.asarray(sw_scores_pallas_grouped(qa, qo, qlen, t, lens, m32, **kw))

    cells = groups * m * batch * n

    t0 = time.perf_counter()
    _ = call(qlen_hi, new_slab())
    compile_s = time.perf_counter() - t0

    # pre-stage EVERY slab before the warmup loop: staging a slab right
    # before its call leaves the 33.5 MB transfer in flight and the trail
    # reads transfer settling (~15 GCUPS) instead of launch-path warmth
    # (measured 2026-08-19); the first warmup launches absorb whatever
    # staging is still outstanding
    warm_slabs = [new_slab() for _ in range(warmup_max)]
    timed_slabs = [new_slab() for _ in range(iters)]

    # ---- warmup convergence loop (untimed for the record; rates logged)
    trail = []
    converged = False
    deadline = time.monotonic() + warmup_budget_s
    for t in warm_slabs:
        if time.monotonic() >= deadline:
            break
        t0 = time.perf_counter()
        _ = call(qlen_hi, t)
        trail.append(cells / (time.perf_counter() - t0) / 1e9)
        if len(trail) >= 3:
            last3 = trail[-3:]
            if max(last3) <= 1.05 * min(last3):
                converged = True
                break

    # ---- timed best-of loop: unique pre-staged device inputs per call
    times = []
    for t in timed_slabs:
        t0 = time.perf_counter()
        _ = call(qlen_hi, t)
        times.append(time.perf_counter() - t0)
    best = min(times)

    # ---- marginal: q_len=m_lo calls on a subset of the same slabs (the
    # (slab, qlen) arg pair is distinct, so no dispatch dedup)
    lo_times = []
    for t in timed_slabs[:marginal_iters]:
        t0 = time.perf_counter()
        _ = call(qlen_lo, t)
        lo_times.append(time.perf_counter() - t0)
    dt = best - min(lo_times)
    marginal = (
        groups * batch * n * (m - m_lo) / dt / 1e9 if dt > 1e-4 else None
    )

    return {
        "gcups": cells / best / 1e9,
        "gcups_median": cells / sorted(times)[len(times) // 2] / 1e9,
        "gcups_iters": [round(cells / t / 1e9, 1) for t in times],
        "marginal_gcups": round(marginal, 2) if marginal else None,
        "warmup_trail": [round(r, 1) for r in trail],
        "warmup_converged": converged,
        "compile_s": round(compile_s, 1),
    }


def bench_xla_scan(batch=512, n=1024, m=1000, iters=8):
    import jax
    import jax.numpy as jnp

    from sift4g_tpu.align.xla import PAD_CODE, _extend_matrix, align_scores_kernel
    from sift4g_tpu.core.scorers import create_scorer

    scorer = create_scorer("BLOSUM_62", 10, 1)
    m32 = jnp.asarray(_extend_matrix(scorer.matrix))
    rng = np.random.default_rng(42)
    m_pad = -(-m // 64) * 64
    q = np.full(m_pad, PAD_CODE, dtype=np.int32)
    q[:m] = rng.integers(0, 26, m)
    q = jnp.asarray(q)
    lens = jnp.asarray(np.full(batch, n, dtype=np.int32))
    targets = [
        jnp.asarray(rng.integers(0, 26, (batch, n)).astype(np.int32))
        for _ in range(iters + 1)
    ]
    _ = np.asarray(align_scores_kernel(q, jnp.int32(m), targets[0], lens, m32))
    cells = m * batch * n
    times = []
    for i in range(iters):
        t0 = time.perf_counter()
        _ = np.asarray(
            align_scores_kernel(q, jnp.int32(m), targets[i + 1], lens, m32)
        )
        times.append(time.perf_counter() - t0)
    return cells / min(times) / 1e9


class _BenchTimeout(Exception):
    pass


def _with_deadline(seconds, fn, *args, **kwargs):
    """Run fn with a SIGALRM deadline — kernel compiles through the remote
    compile service can take many minutes when it is loaded, and the
    driver's bench window is finite."""
    import signal

    def _raise(signum, frame):
        raise _BenchTimeout(f"exceeded {seconds}s")

    old = signal.signal(signal.SIGALRM, _raise)
    signal.alarm(seconds)
    try:
        return fn(*args, **kwargs)
    finally:
        signal.alarm(0)
        signal.signal(signal.SIGALRM, old)


def bench_native_cpu(n_targets=4096, n=512, m=360, simd=True):
    """Measured CPU numbers at the bench workload shape.

    ``simd=False`` forces the scalar rolling-row C++ DP — the honest
    stand-in for the reference's plain-C++ CPU build (its swsharp
    compute library is an empty submodule), used as the vs_baseline
    denominator.  ``simd=True`` is this framework's own CPU deployment
    path (striped AVX2 int16 SW, native/sw_simd.cpp) and the fallback
    metric when no accelerator is reachable."""
    from sift4g_tpu.align.batch import score_pairs_batch
    from sift4g_tpu.core.scorers import create_scorer

    scorer = create_scorer("BLOSUM_62", 10, 1)
    rng = np.random.default_rng(42)
    q = rng.integers(0, 26, m).astype(np.uint8)
    targets = [rng.integers(0, 26, n).astype(np.uint8) for _ in range(n_targets)]
    if not simd:
        os.environ["SIFT4G_TPU_NO_SIMD"] = "1"
    try:
        score_pairs_batch(q, targets[:64], scorer, "SW")  # warm the lib
        t0 = time.perf_counter()
        score_pairs_batch(q, targets, scorer, "SW")
        dt = time.perf_counter() - t0
    finally:
        if not simd:
            os.environ.pop("SIFT4G_TPU_NO_SIMD", None)
    return m * n * n_targets / dt / 1e9


def _probe_relay(probe_port=8082, timeout=3):
    """One socket probe of the relay tunnel.  Returns None on success,
    else the OSError."""
    import socket

    s = socket.socket()
    s.settimeout(timeout)
    try:
        s.connect(("127.0.0.1", probe_port))
        return None
    except OSError as exc:
        return exc
    finally:
        s.close()


def _discover_tpu(jax, probe_port=8082, join_timeout=120):
    """True/False = device platform discovered; None = relay unusable.

    jax.devices() blocks in C (grpc connect/retry) when the axon tunnel
    is half-up, so a SIGALRM deadline cannot interrupt it — probe the
    tunnel socket first, then discover on a daemon thread with a join
    timeout (docs/PLATFORM.md "Compile-service wedge + tunnel collapse").

    A refused probe is retried every ~30 s for up to
    SIFT4G_TPU_RELAY_WAIT seconds (default 600): tunnel outages observed
    on this host are driver-managed and can recover mid-bench-window, and
    one recovered probe turns the round's official record from the CPU
    fallback into a real chip number (VERDICT r2 item 1)."""
    import threading

    if os.environ.get("JAX_PLATFORMS", "") not in ("", "axon"):
        return jax.devices()[0].platform != "cpu"
    wait_budget = float(os.environ.get("SIFT4G_TPU_RELAY_WAIT", "600"))
    deadline = time.monotonic() + wait_budget
    attempt = 0
    while True:
        exc = _probe_relay(probe_port)
        if exc is None:
            break
        attempt += 1
        remaining = deadline - time.monotonic()
        if remaining <= 0:
            print(
                f"relay probe failed ({exc}) after {attempt} attempts over "
                f"{wait_budget:.0f}s; native CPU DP",
                file=sys.stderr,
            )
            return None
        print(
            f"relay probe failed ({exc}); retrying for {remaining:.0f}s more",
            file=sys.stderr,
        )
        time.sleep(min(30.0, remaining))
    result = {}

    def _discover():
        try:
            result["on_tpu"] = jax.devices()[0].platform != "cpu"
        except Exception as exc:  # discovery raised: report, don't hang
            result["err"] = exc

    t = threading.Thread(target=_discover, daemon=True)
    t.start()
    t.join(join_timeout)
    if "on_tpu" in result:
        return result["on_tpu"]
    reason = result.get("err", f"no devices after {join_timeout}s")
    print(f"device discovery failed ({reason}); native CPU DP", file=sys.stderr)
    return None


# Frozen FALLBACK roofline (tools/bench_ab.py dprow, 2026-08-17): used
# only when the in-run re-probe (align/roofline.py) fails — a frozen
# denominator conflates kernel efficiency with session health, so the
# official roofline_pct divides by the same-session probe whenever it
# can, and "roofline_src" says which one was used.
ROOFLINE_GCUPS = 58.24


def main():
    import jax

    # CPU numbers first (pure C++: cannot poison device timing):
    # scalar = reference stand-in baseline; simd = this framework's own
    # CPU path (and the no-accelerator fallback metric)
    try:
        baseline = _with_deadline(120, bench_native_cpu, simd=False)
    except Exception as exc:
        print(f"native baseline failed ({exc}); using last measured", file=sys.stderr)
        baseline = FALLBACK_BASELINE_GCUPS
    try:
        cpu_simd = _with_deadline(120, bench_native_cpu, simd=True)
    except Exception as exc:
        print(f"simd bench failed ({exc})", file=sys.stderr)
        cpu_simd = baseline

    # device discovery itself can hang when the relay tunnel is down
    # (observed 2026-08-18: connection-refused ports + a runtime that
    # blocks INSIDE a C call, so SIGALRM never fires) — socket-probe the
    # tunnel, then run discovery on a daemon thread with a join timeout,
    # and fall back to the CPU number rather than hanging the driver's
    # bench window
    on_tpu = _discover_tpu(jax)
    if on_tpu is None:
        # self-describing fallback record: the relay tunnel was down (or
        # device discovery hung) for the whole retry window — report the
        # framework's own CPU path vs the scalar reference stand-in
        print(json.dumps({
            "metric": "sw_score_gcups[native-cpu-simd]",
            "value": round(cpu_simd, 3),
            "unit": "GCUPS",
            "vs_baseline": round(cpu_simd / baseline, 2),
            "baseline_gcups": round(baseline, 3),
            "relay": "down",
        }))
        sys.stdout.flush()
        # a wedged PJRT init thread would block normal exit
        os._exit(0)
    detail = {}
    if on_tpu:
        try:
            detail = _with_deadline(1200, bench_grouped_pallas)
            gcups = detail.pop("gcups")
            metric = "sw_score_gcups[pallas-grouped]"
        except Exception as exc:
            print(f"pallas bench failed ({exc}); falling back to xla", file=sys.stderr)
            try:
                gcups = _with_deadline(120, bench_xla_scan)
                metric = "sw_score_gcups[xla]"
            except Exception as exc2:
                print(f"xla bench failed ({exc2}); native CPU DP", file=sys.stderr)
                gcups = cpu_simd
                metric = "sw_score_gcups[native-cpu-simd]"
    else:
        gcups = bench_xla_scan()
        metric = "sw_score_gcups[xla-cpu]"
    out = {
        "metric": metric,
        "value": round(gcups, 3),
        "unit": "GCUPS",
        "vs_baseline": round(gcups / baseline, 2),
        "baseline_gcups": round(baseline, 3),
        "cpu_simd_gcups": round(cpu_simd, 3),
        "relay": "up" if on_tpu else "cpu-platform",
    }
    out.update({k: v for k, v in detail.items() if v is not None})
    if on_tpu and metric.startswith("sw_score_gcups[pallas"):
        # re-probe the row-engine roofline IN THIS SESSION (after the timed
        # loop, so the tiny probe cannot perturb the official number) —
        # divides out relay-session mood from the percentage
        roofline, src = ROOFLINE_GCUPS, "frozen-2026-08-17"
        try:
            from sift4g_tpu.align.roofline import dp_row_roofline

            probe = _with_deadline(420, dp_row_roofline)
            roofline, src = probe["gcups"], "in-run"
            out["roofline_compile_s"] = probe["compile_s"]
        except Exception as exc:
            print(f"in-run roofline probe failed ({exc}); frozen", file=sys.stderr)
        out["roofline_gcups"] = round(roofline, 2)
        out["roofline_src"] = src
        out["roofline_pct"] = round(100.0 * gcups / roofline, 1)
        if detail.get("marginal_gcups"):
            out["marginal_roofline_pct"] = round(
                100.0 * detail["marginal_gcups"] / roofline, 1
            )
    elif on_tpu and ROOFLINE_GCUPS:
        out["roofline_pct"] = round(100.0 * gcups / ROOFLINE_GCUPS, 1)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
