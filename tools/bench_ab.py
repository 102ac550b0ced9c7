"""Real-chip measurement harness: kernel A/B runs + VPU roofline probe.

Subcommands (one per process — co-resident jitted programs can poison
timing, docs/PLATFORM.md trap 3):

* ``ab``       — grouped kernel at the bench shape with acc="int" then
                 acc="i16": bit-parity assert + marginal GCUPS for both.
* ``roofline`` — Pallas microkernel: M rounds of (add, max) on a VMEM-
                 resident (B, N) i32 tile -> sustained VPU ops/s peak.
* ``native``   — threaded C++ DP at the bench workload shape (m=360,
                 n=512) -> the measured CPU baseline for bench.py.

All timings follow the platform measurement rules: unique input per call,
fetch-forced (np.asarray), SIGALRM deadline around compiles.
"""

import json
import os
import sys
import time
from functools import partial

import numpy as np

# self-locating: works as a bare subprocess from any cwd even when the
# package is not installed in the venv
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _deadline(seconds):
    import signal

    def _raise(signum, frame):
        raise TimeoutError(f"exceeded {seconds}s")

    signal.signal(signal.SIGALRM, _raise)
    signal.alarm(seconds)


def run_ab(groups=64, batch=1024, n=512, m=360, iters=6):
    import jax.numpy as jnp

    from sift4g_tpu.align.pallas_sw import PAD_CODE, sw_scores_pallas_grouped
    from sift4g_tpu.align.xla import _extend_matrix
    from sift4g_tpu.core.scorers import create_scorer

    scorer = create_scorer("BLOSUM_62", 10, 1)
    m32 = jnp.asarray(_extend_matrix(scorer.matrix))
    rng = np.random.default_rng(42)

    m_pad = -(-m // 64) * 64
    q_all = np.full(groups * m_pad, PAD_CODE, dtype=np.int32)
    for g in range(groups):
        q_all[g * m_pad : g * m_pad + m] = rng.integers(0, 26, m)
    q_off = (np.arange(groups) * m_pad).astype(np.int32)
    q_len = np.full(groups, m, dtype=np.int32)
    targets = [
        jnp.asarray(rng.integers(0, 26, (groups, batch, n)).astype(np.int8))
        for _ in range(iters + 1)
    ]
    lens = jnp.asarray(np.full((groups, batch), n, dtype=np.int32))
    args = (jnp.asarray(q_all), jnp.asarray(q_off), jnp.asarray(q_len))
    cells = groups * m * batch * n

    out = {}
    ref0 = None
    for acc in ("int", "i16"):
        call = lambda t: np.asarray(
            sw_scores_pallas_grouped(
                *args, t, lens, m32,
                max_qlen=m_pad, max_sub=int(scorer.matrix.max()), acc=acc,
            )
        )
        t0 = time.perf_counter()
        got0 = call(targets[0])  # compile
        compile_s = time.perf_counter() - t0
        if ref0 is None:
            ref0 = got0
        else:
            assert np.array_equal(ref0, got0), "i16 != int32 on hardware!"
        times = []
        for i in range(iters):
            t0 = time.perf_counter()
            _ = call(targets[i + 1])
            times.append(time.perf_counter() - t0)
        out[acc] = {
            "gcups": round(cells / min(times) / 1e9, 2),
            "all_gcups": [round(cells / t / 1e9, 2) for t in times],
            "compile_s": round(compile_s, 1),
        }
        print(json.dumps({"acc": acc, **out[acc]}), flush=True)
    print(json.dumps({"parity": "ok", **{k: v["gcups"] for k, v in out.items()}}))


def run_roofline(B=1024, N=512, iters=6):
    """Peak VPU i32 throughput, overhead-free: the round count M is a
    RUNTIME scalar (one compile), and the rate is the differential
    (ops(M2) - ops(M1)) / (t(M2) - t(M1)) — the fixed ~30 ms launch cost
    and any fixed prologue cancel.  (A first attempt with static M=20000
    measured 0.79 Tops because 21G ops at peak take ~5 ms, fully hidden
    under the launch overhead.)

    Loop body: two carried (B, N) i32 arrays, a' = max(a + 1, b),
    b' = max(b - 1, a) — 2 elementwise ops per element per round, an
    add/max mix like the DP row body, and nothing the compiler can fold.
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kern(m_ref, out_ref):
        a = jax.lax.broadcasted_iota(jnp.int32, (B, N), 1) + m_ref[1]
        b = jax.lax.broadcasted_iota(jnp.int32, (B, N), 0) - m_ref[1]

        def body(i, ab):
            a, b = ab
            return jnp.maximum(a + 1, b), jnp.maximum(b - 1, a)

        a, b = jax.lax.fori_loop(0, m_ref[0], body, (a, b), unroll=False)
        out_ref[:] = jnp.max(jnp.maximum(a, b), axis=1, keepdims=True)

    @jax.jit
    def probe(m):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((B, 1), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(m)

    def timed(M, salt):
        t0 = time.perf_counter()
        _ = np.asarray(probe(jnp.asarray(np.array([M, salt], np.int32))))
        return time.perf_counter() - t0

    t0 = time.perf_counter()
    timed(100, 0)  # compile
    compile_s = time.perf_counter() - t0
    lo, hi = 25_000, 100_000
    t_lo = min(timed(lo, 1 + i) for i in range(iters))
    t_hi = min(timed(hi, 100 + i) for i in range(iters))
    # 2 arrays x 2 ops per element per round
    d_ops = 4 * B * N * (hi - lo)
    tops = d_ops / (t_hi - t_lo) / 1e12
    print(json.dumps({
        "metric": "vpu_i32_tops_marginal",
        "tops": round(tops, 3),
        "t_lo_s": round(t_lo, 4), "t_hi_s": round(t_hi, 4),
        "compile_s": round(compile_s, 1),
    }))


def run_roofline_ilp(B=1024, N=512, iters=6, pairs=4):
    """Like ``roofline`` but with ``pairs`` independent (a, b) chains per
    round — exposes whether the single-chain probe is ILP-bound (rate
    scales with pairs) or throughput-bound (rate flat)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kern(m_ref, out_ref):
        ab = []
        for p in range(pairs):
            a = jax.lax.broadcasted_iota(jnp.int32, (B, N), 1) + m_ref[1] + p
            b = jax.lax.broadcasted_iota(jnp.int32, (B, N), 0) - m_ref[1] - p
            ab.append((a, b))

        def body(i, ab):
            return tuple(
                (jnp.maximum(a + 1, b), jnp.maximum(b - 1, a)) for a, b in ab
            )

        ab = jax.lax.fori_loop(0, m_ref[0], body, tuple(ab), unroll=False)
        acc = ab[0][0]
        for a, b in ab:
            acc = jnp.maximum(acc, jnp.maximum(a, b))
        out_ref[:] = jnp.max(acc, axis=1, keepdims=True)

    @jax.jit
    def probe(m):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((B, 1), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
        )(m)

    def timed(M, salt):
        t0 = time.perf_counter()
        _ = np.asarray(probe(jnp.asarray(np.array([M, salt], np.int32))))
        return time.perf_counter() - t0

    t0 = time.perf_counter()
    timed(100, 0)
    compile_s = time.perf_counter() - t0
    lo, hi = 25_000 // pairs, 100_000 // pairs
    t_lo = min(timed(lo, 1 + i) for i in range(iters))
    t_hi = min(timed(hi, 100 + i) for i in range(iters))
    d_ops = 4 * pairs * B * N * (hi - lo)
    tops = d_ops / (t_hi - t_lo) / 1e12
    print(json.dumps({
        "metric": f"vpu_i32_tops_marginal[pairs{pairs}]",
        "tops": round(tops, 3),
        "t_lo_s": round(t_lo, 4), "t_hi_s": round(t_hi, 4),
        "compile_s": round(compile_s, 1),
    }))


def run_dprow(B=1024, N=512, go=10, ge=1, iters=6):
    """The kernel's true roofline: the exact SW row recurrence (roll
    shifts, 9 prefix rounds at N=512, local clamp, best tracking) with a
    RUNTIME row count and a constant substitution vector — no planes
    rebuild, no SMEM query reads, no launch overhead (differential).
    Marginal rows/s x B x N = the cell rate the row engine can sustain;
    the production kernel's marginal GCUPS over this is the honest
    roofline percentage.  The probe itself lives in the package
    (align/roofline.py) because bench.py re-runs it every official record."""
    from sift4g_tpu.align.roofline import dp_row_roofline

    out = dp_row_roofline(B=B, N=N, go=go, ge=ge, iters=iters)
    print(json.dumps({"metric": "dp_row_engine_gcups_marginal", **out}))


def run_unroll(groups=64, batch=1024, n=512, m=360, iters=6, u=2):
    """Hardware A/B: grouped kernel with unroll=u query rows per loop
    iteration.  Compare against the same-day int32 unroll=1 measurement
    (46.7 GCUPS, 2026-08-17); bit-parity across unrolls is interpret-tested
    (test_pallas_grouped.py)."""
    import jax.numpy as jnp

    from sift4g_tpu.align.pallas_sw import PAD_CODE, sw_scores_pallas_grouped
    from sift4g_tpu.align.xla import _extend_matrix
    from sift4g_tpu.core.scorers import create_scorer

    scorer = create_scorer("BLOSUM_62", 10, 1)
    m32 = jnp.asarray(_extend_matrix(scorer.matrix))
    rng = np.random.default_rng(42)
    m_pad = -(-m // 64) * 64
    q_all = np.full(groups * m_pad, PAD_CODE, dtype=np.int32)
    for g in range(groups):
        q_all[g * m_pad : g * m_pad + m] = rng.integers(0, 26, m)
    q_off = (np.arange(groups) * m_pad).astype(np.int32)
    q_len = np.full(groups, m, dtype=np.int32)
    targets = [
        jnp.asarray(rng.integers(0, 26, (groups, batch, n)).astype(np.int8))
        for _ in range(iters + 1)
    ]
    lens = jnp.asarray(np.full((groups, batch), n, dtype=np.int32))
    args = (jnp.asarray(q_all), jnp.asarray(q_off), jnp.asarray(q_len))
    cells = groups * m * batch * n
    call = lambda t: np.asarray(
        sw_scores_pallas_grouped(*args, t, lens, m32, unroll=u)
    )
    t0 = time.perf_counter()
    _ = call(targets[0])
    compile_s = time.perf_counter() - t0
    times = []
    for i in range(iters):
        t0 = time.perf_counter()
        _ = call(targets[i + 1])
        times.append(time.perf_counter() - t0)
    print(json.dumps({
        "metric": f"sw_score_gcups[unroll{u}]",
        "gcups": round(cells / min(times) / 1e9, 2),
        "all_gcups": [round(cells / t / 1e9, 2) for t in times],
        "compile_s": round(compile_s, 1),
    }))


def run_native(n_targets=8192, n=512, m=360):
    """Score-only threaded C++ DP at the bench workload shape — the
    measured CPU baseline (apples-to-apples: the TPU kernels are also
    score-only; traceback runs host-side for winners in both designs)."""
    from sift4g_tpu.align.batch import score_pairs_batch
    from sift4g_tpu.core.scorers import create_scorer

    scorer = create_scorer("BLOSUM_62", 10, 1)
    rng = np.random.default_rng(42)
    q = rng.integers(0, 26, m).astype(np.uint8)
    targets = [rng.integers(0, 26, n).astype(np.uint8) for _ in range(n_targets)]
    score_pairs_batch(q, targets[:64], scorer, "SW")  # warm
    t0 = time.perf_counter()
    score_pairs_batch(q, targets, scorer, "SW")
    dt = time.perf_counter() - t0
    print(json.dumps({
        "metric": "native_cpu_score_gcups",
        "gcups": round(m * n * n_targets / dt / 1e9, 3),
    }))


def main():
    cmd = sys.argv[1]
    _deadline(int(sys.argv[2]) if len(sys.argv) > 2 else 1800)
    if cmd == "ab":
        run_ab()
    elif cmd == "roofline":
        run_roofline()
    elif cmd == "roofline2":
        run_roofline_ilp(pairs=2)
    elif cmd == "roofline4":
        run_roofline_ilp(pairs=4)
    elif cmd == "dprow":
        run_dprow()
    elif cmd == "unroll":
        run_unroll()
    elif cmd == "unroll4":
        run_unroll(u=4)
    elif cmd == "g128":
        # launch-tax A/B: doubled grid (24 Gcells/launch vs 12) against the
        # same-day G=64 number — the remaining roofline gap is launch
        # amortization, not DP compute (docs/PLATFORM.md "Roofline")
        run_unroll(groups=128)
    elif cmd == "g64":
        run_unroll(groups=64)
    elif cmd == "native":
        run_native()
    else:
        raise SystemExit(f"unknown: {cmd}")


if __name__ == "__main__":
    main()
