"""Transposed-layout experiment: target columns on SUBLANES.

In the production kernel (pallas_sw.py) the prefix-max runs as lane-axis
rolls: every one of the log2(N) rounds is a cross-lane rotate.  With the
column axis on sublanes instead, shifts that are multiples of the 8-row
sublane tile reduce to tile re-indexing, so 6 of 9 rounds at N=512 should
be much cheaper.  This module exists to A/B that hypothesis; if it wins
on hardware it replaces the layout in the grouped kernel.

Semantics identical to sw_scores_pallas_grouped (exact int32 scores);
property-tested against the XLA scan.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -(1 << 28)
PAD_CODE = 31


def _sw_t_kernel(
    q_ref,        # SMEM (Qm,) i32
    qoff_ref,     # SMEM (G,) i32
    qlen_ref,     # SMEM (G,) i32
    m32_ref,      # SMEM (1024,) i32
    targets_ref,  # VMEM (1, N, B) i32/int8 — transposed block
    lens_ref,     # VMEM (1, 1, B) i32
    out_ref,      # VMEM (1, 1, B) i32
    planes_scr,   # VMEM (26, N, B) int8
    h_scr,        # VMEM (N, B) i32
    f_scr,        # VMEM (N, B) i32
    best_scr,     # VMEM (N, B) i32
    *,
    mode: str,
    go: int,
    ge: int,
):
    g = pl.program_id(0)
    N, B = h_scr.shape
    col = jax.lax.broadcasted_iota(jnp.int32, (N, B), 0)   # j-1 on sublanes

    t = targets_ref[0].astype(jnp.int32)
    bits = [(t >> k) & 1 != 0 for k in range(5)]

    def plane_body(c, _):
        base = c * 32
        w = [
            jnp.where(bits[0], m32_ref[base + 2 * d + 1], m32_ref[base + 2 * d])
            for d in range(16)
        ]
        for lvl in range(1, 5):
            w = [jnp.where(bits[lvl], w[2 * i + 1], w[2 * i]) for i in range(len(w) // 2)]
        planes_scr[c] = w[0].astype(jnp.int8)
        return 0

    jax.lax.fori_loop(0, 26, plane_body, 0, unroll=False)

    free_top = mode in ("SW", "HW", "OV")
    free_left = mode in ("SW", "OV")
    local = mode == "SW"

    if free_top:
        h_scr[:] = jnp.zeros((N, B), jnp.int32)
    else:
        h_scr[:] = -(go + col * ge)
    f_scr[:] = jnp.full((N, B), NEG, jnp.int32)
    best_scr[:] = jnp.full((N, B), NEG if not local else 0, jnp.int32)

    n_rounds = max(1, (N - 1).bit_length())
    jge1 = (col + 1) * ge
    goge = go + col * ge
    qoff = qoff_ref[g]
    lens01 = lens_ref[0]                                   # (1, B)

    def row_body(i, _):
        c = q_ref[qoff + i]
        s = planes_scr[c].astype(jnp.int32)
        hp = h_scr[:]
        fp = f_scr[:]
        if free_left:
            left0 = jnp.int32(0)
            left0_prev = jnp.int32(0)
        else:
            left0 = -(go + i * ge)
            left0_prev = jnp.where(i == 0, 0, -(go + (i - 1) * ge))
        f = jnp.maximum(hp - go, fp - ge)
        diag = pltpu.roll(hp, 1, axis=0)
        diag = jnp.where(col == 0, left0_prev, diag)
        g_ = jnp.maximum(diag + s, f)
        if local:
            g_ = jnp.maximum(g_, 0)
        cmax = g_ + jge1
        for r in range(n_rounds):
            k = 1 << r
            cmax = jnp.maximum(cmax, jnp.where(col < k, NEG, pltpu.roll(cmax, k, axis=0)))
        cm1 = jnp.where(col < 1, NEG, pltpu.roll(cmax, 1, axis=0))
        e = jnp.maximum(left0, cm1) - goge
        h = jnp.maximum(g_, e)
        h_scr[:] = h
        f_scr[:] = f
        if local:
            best_scr[:] = jnp.maximum(best_scr[:], h)
        elif mode == "OV":
            best_scr[:] = jnp.maximum(
                best_scr[:], jnp.where(col == lens01 - 1, h, NEG)
            )
        return 0

    jax.lax.fori_loop(0, qlen_ref[g], row_body, 0, unroll=False)

    col_valid = col < lens01
    hfin = h_scr[:]
    bestf = best_scr[:]
    if mode == "SW":
        out = jnp.max(jnp.where(col_valid, bestf, 0), axis=0, keepdims=True)
    elif mode == "NW":
        out = jnp.max(jnp.where(col == lens01 - 1, hfin, NEG), axis=0, keepdims=True)
    elif mode == "HW":
        out = jnp.max(jnp.where(col_valid, hfin, NEG), axis=0, keepdims=True)
    else:  # OV
        row_best = jnp.max(jnp.where(col_valid, hfin, NEG), axis=0, keepdims=True)
        col_best = jnp.max(bestf, axis=0, keepdims=True)
        out = jnp.maximum(jnp.maximum(row_best, col_best), 0)
    out_ref[0] = out


@partial(jax.jit, static_argnames=("mode", "gap_open", "gap_extend"))
def sw_scores_pallas_grouped_t(
    q_codes_all: jnp.ndarray,   # (Qm,) int32
    q_offsets: jnp.ndarray,     # (G,) int32
    q_lens: jnp.ndarray,        # (G,) int32
    targets_t: jnp.ndarray,     # (G, N, B) int8 — TRANSPOSED target codes
    target_lens: jnp.ndarray,   # (G, B) int32
    matrix32: jnp.ndarray,      # (32, 32) int32
    *,
    mode: str = "SW",
    gap_open: int = 10,
    gap_extend: int = 1,
) -> jnp.ndarray:
    """Scores (G, B) int32 with the transposed (columns-on-sublanes) layout."""
    G, N, B = targets_t.shape
    m32_flat = jnp.clip(matrix32, -128, 127).astype(jnp.int32).reshape(32 * 32)
    lens3 = target_lens.astype(jnp.int32).reshape(G, 1, B)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(G,),
        in_specs=[
            pl.BlockSpec((1, N, B), lambda g, *_: (g, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, B), lambda g, *_: (g, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, B), lambda g, *_: (g, 0, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((26, N, B), jnp.int8),
            pltpu.VMEM((N, B), jnp.int32),
            pltpu.VMEM((N, B), jnp.int32),
            pltpu.VMEM((N, B), jnp.int32),
        ],
    )
    out = pl.pallas_call(
        partial(_sw_t_kernel, mode=mode, go=gap_open, ge=gap_extend),
        out_shape=jax.ShapeDtypeStruct((G, 1, B), jnp.int32),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(
        q_codes_all.astype(jnp.int32),
        q_offsets.astype(jnp.int32),
        q_lens.astype(jnp.int32),
        m32_flat,
        targets_t.astype(jnp.int8),
        lens3,
    )
    return out[:, 0, :]
