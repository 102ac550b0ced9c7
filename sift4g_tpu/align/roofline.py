"""In-run DP row-engine roofline probe.

The honest per-chip ceiling for the SW kernels is NOT an ops/ALU-peak
model (rolls/selects/masks co-issue on other VPU ports — measured 3x the
naive ALU bound, docs/PLATFORM.md "Roofline"); it is the sustained rate of
the exact production row recurrence with a RUNTIME row count, timed
differentially so the ~30 ms launch tax and any fixed prologue cancel.

bench.py re-probes this every official run and divides by it: a frozen
roofline constant conflates kernel efficiency with session health — if the
relay session is systematically slow, the roofline measured in that same
session is lower too, and the reported percentage stays honest
(VERDICT r3 weak #6).  The probe is tiny (3 scratch tiles, no grid), so
its compile is far cheaper than the production kernel's.

Reference analogue: the device DP hot loop the reference offloads to
swsharp, /root/reference/sift4g/src/database_alignment.cpp:83-86.
"""

from __future__ import annotations

import time

import numpy as np

NEGL = -(10 ** 7)


def dp_row_roofline(B=1024, N=512, go=10, ge=1, iters=6, lo=1_000, hi=4_000):
    """Measure the row engine's marginal cell rate on the current device.

    Returns a dict: ``gcups`` (marginal B*N cells/row over the runtime
    row-count delta), ``t_lo_s``/``t_hi_s`` (best-of-`iters` wall times at
    each trip count), ``compile_s``.  Raises on compile failure — callers
    fall back to the frozen 2026-08-17 constant and say so.
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_rounds = max(1, (N - 1).bit_length())

    def kern(m_ref, out_ref, h_scr, f_scr, best_scr):
        # DP state lives in VMEM scratch exactly like the production kernel
        # (loop-carried (B, N) vregs trip Mosaic replicated-layout relayout
        # bugs at this shape; scratch loads/stores normalize the layout)
        col = jax.lax.broadcasted_iota(jnp.int32, (B, N), 1)
        s0 = (col % 11) - 4 + m_ref[1]
        s1 = ((col + 5) % 13) - 6 - m_ref[1]
        jge1 = (col + 1) * ge
        goge = go + col * ge

        h_scr[:] = jnp.zeros((B, N), jnp.int32)
        f_scr[:] = jnp.full((B, N), NEGL, jnp.int32)
        best_scr[:] = jnp.zeros((B, N), jnp.int32)

        def shift_neg(x, k):
            return jnp.where(col < k, NEGL, pltpu.roll(x, k, axis=1))

        def shift1(x):
            return pltpu.roll(x, 1, axis=1)

        def row(i, _):
            hp = h_scr[:]
            fp = f_scr[:]
            # vector condition: a scalar-cond where over (B, N) vectors hits
            # the Mosaic replicated-layout bug (docs/PLATFORM.md int8 note)
            s = jnp.where((col + i) % 2 == 0, s0, s1)
            f = jnp.maximum(hp - go, fp - ge)
            diag = jnp.where(col == 0, 0, shift1(hp))
            g_ = jnp.maximum(jnp.maximum(diag + s, f), 0)
            cmax = g_ + jge1
            for r in range(n_rounds):
                cmax = jnp.maximum(cmax, shift_neg(cmax, 1 << r))
            e = jnp.maximum(0, shift_neg(cmax, 1)) - goge
            h = jnp.maximum(g_, e)
            h_scr[:] = h
            f_scr[:] = f
            best_scr[:] = jnp.maximum(best_scr[:], h)
            return 0

        jax.lax.fori_loop(0, m_ref[0], row, 0, unroll=False)
        out_ref[:] = jnp.max(best_scr[:], axis=1, keepdims=True)

    @jax.jit
    def probe(m):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((B, 1), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((B, N), jnp.int32),
                pltpu.VMEM((B, N), jnp.int32),
                pltpu.VMEM((B, N), jnp.int32),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
        )(m)

    def timed(M, salt):
        t0 = time.perf_counter()
        _ = np.asarray(probe(jnp.asarray(np.array([M, salt], np.int32))))
        return time.perf_counter() - t0

    t0 = time.perf_counter()
    timed(64, 0)  # compile
    compile_s = time.perf_counter() - t0
    # unique salt per call: repeated identical dispatches get deduplicated
    t_lo = min(timed(lo, 1 + i) for i in range(iters))
    t_hi = min(timed(hi, 100 + i) for i in range(iters))
    gcups = B * N * (hi - lo) / (t_hi - t_lo) / 1e9
    return {
        "gcups": round(gcups, 2),
        "t_lo_s": round(t_lo, 4),
        "t_hi_s": round(t_hi, 4),
        "compile_s": round(compile_s, 1),
    }
