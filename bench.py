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
"""

import json
import os
import sys
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

FALLBACK_BASELINE_GCUPS = 0.83  # last measured native CPU (4-core host)


def bench_grouped_pallas(groups=64, batch=1024, n=512, m=360, iters=10, warmups=3):
    import jax
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
    q_len = np.full(groups, m, dtype=np.int32)
    for g in range(groups):
        q_all[g * m_pad : g * m_pad + m] = rng.integers(0, 26, m)
    targets = [
        jnp.asarray(rng.integers(0, 26, (groups, batch, n)).astype(np.int8))
        for _ in range(iters + warmups)
    ]
    lens = np.full((groups, batch), n, dtype=np.int32)

    args = (jnp.asarray(q_all), jnp.asarray(q_off), jnp.asarray(q_len))
    # static bounds kept for shape parity with production calls (they gate
    # the int16 path, which is dead on v5e — docs/PLATFORM.md); the kernel
    # runs int32 with the unroll=2 production default
    kw = dict(max_qlen=m_pad, max_sub=11)
    call = lambda t: np.asarray(
        sw_scores_pallas_grouped(*args, t, jnp.asarray(lens), m32, **kw)
    )
    # compile + a few untimed launches: first-process launches through the
    # relay run ~20% slow even post-compile (measured 2026-08-18: 40.3 vs
    # 48.3 GCUPS best-of-6 across two fresh processes) — warm the launch
    # path before timing
    for i in range(warmups):
        _ = call(targets[i])

    cells = groups * m * batch * n
    times = []
    for i in range(iters):
        t0 = time.perf_counter()
        _ = call(targets[i + warmups])
        times.append(time.perf_counter() - t0)
    best = min(times)
    return cells / best / 1e9


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


# Measured roofline: the exact SW row recurrence with a runtime row count
# and no launch/planes/scalar overhead sustains this marginal rate on v5e
# (tools/bench_ab.py dprow, 2026-08-17; docs/PLATFORM.md "Roofline").
# The production kernel's marginal rate is 56-58 GCUPS (~97-100% of this);
# the launch-amortized bench number carries the ~30 ms launch tax.
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
    if on_tpu:
        try:
            gcups = _with_deadline(1200, bench_grouped_pallas)
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
    if on_tpu and ROOFLINE_GCUPS:
        out["roofline_pct"] = round(100.0 * gcups / ROOFLINE_GCUPS, 1)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
