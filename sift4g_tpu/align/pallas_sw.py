"""Pallas TPU kernel: batched affine-gap alignment scores (SW/NW/HW/OV).

The hot op of the pipeline — the reference runs this DP in swsharp's CUDA
kernels (database_alignment.cpp:83-86); here it is a single-invocation
Mosaic kernel designed for zero per-cell HBM traffic:

* **Substitution planes, built in-kernel**: the (query_code, target_code)
  score lookup is hoisted out of the DP.  A prologue materializes
  ``planes[c][b, j] = matrix[c, t[b, j]]`` (26 int8 planes of (B, N) in
  VMEM scratch) with a 5-bit binary select tree over the target codes —
  XLA's gather lowering on TPU runs on the scalar core (measured ~2.3 ms
  for a (256, 512) 32-entry LUT — slower than the entire DP), so no
  gather appears anywhere.  Each DP row then *selects* plane
  ``q_codes[i]`` (a dynamic leading-axis index): the inner loop does no
  gathers and no matmuls.
* **Row-parallel scan**: the in-row serial E dependency is removed with
  the decayed-prefix-max identity (same as align/xla.py — see the proof
  there); the prefix max runs as log2(N) unrolled roll+max rounds on the
  lane axis.
* DP state (H, F, running best) lives in VMEM scratch across the
  ``fori_loop`` over query rows; only the (B,) results leave the chip.

Scores are exact int32 — bit-identical to the NumPy oracle (dp_numpy.py)
and the XLA scan; a property test asserts equality on random batches for
all four modes.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -(1 << 28)
PAD_CODE = 31

# default tile: planes are (26, B, N) int8 in VMEM -> ~3.4 MB at (256, 512)
DEFAULT_B = 256
DEFAULT_N = 512


def _pack_matrix_quads(matrix32: jnp.ndarray) -> jnp.ndarray:
    """(32, 32) i32 substitution matrix -> (256,) i32 quad-packed planes.

    ``pm[p * 32 + t]`` holds planes (query codes) 4p..4p+3 at target code
    ``t`` as four biased-uint8 byte lanes ((clip(m)+128) << 8k).  The
    in-kernel 5-bit select tree over target codes then runs ONCE PER QUAD
    instead of once per plane — 7 trees instead of 26 (the prologue was
    ~26x31 vector selects per group, a measured double-digit share of
    grouped-kernel time; VERDICT r4 weak #5) — and each selected word
    unpacks into four planes with shift/mask.  Bit-exact: byte lanes
    survive signed-int32 packing in two's complement (the k=3 lane may
    overflow into the sign bit; ``(pm >> 24) & 255`` still recovers it),
    and ``lane - 128`` restores the exact clipped score."""
    m = jnp.clip(matrix32, -128, 127).astype(jnp.int32) + 128   # [0, 255]
    quads = m.reshape(8, 4, 32)
    pm = (
        quads[:, 0]
        | (quads[:, 1] << 8)
        | (quads[:, 2] << 16)
        | (quads[:, 3] << 24)
    )
    return pm.reshape(256)


def _build_planes(planes_scr, pm_ref, bits) -> None:
    """Fill planes_scr[0..25] from the quad-packed matrix (see
    _pack_matrix_quads).  Quads 0..5 store four planes each; quad 6
    stores only planes 24-25 (codes 26..31 are pad codes no query row
    selects — the row loop is qlen-bounded and query codes are < 26).
    One fori_loop keeps the Mosaic program small (the fully unrolled
    26-plane tree multiplied compile time past 9 minutes)."""

    def quad_body(p, _):
        base = p * 32
        w = [
            jnp.where(bits[0], pm_ref[base + 2 * d + 1], pm_ref[base + 2 * d])
            for d in range(16)
        ]
        for lvl in range(1, 5):
            w = [jnp.where(bits[lvl], w[2 * i + 1], w[2 * i]) for i in range(len(w) // 2)]
        packed = w[0]
        for k in range(4):
            @pl.when(4 * p + k < 26)
            def _(k=k):
                planes_scr[4 * p + k] = (
                    ((packed >> (8 * k)) & 255) - 128
                ).astype(jnp.int8)
        return 0

    jax.lax.fori_loop(0, 7, quad_body, 0, unroll=False)


def _sw_kernel(
    q_ref,        # SMEM (m_pad,) i32 — scalar-prefetched query codes
    qlen_ref,     # SMEM (1,) i32
    m32_ref,      # SMEM (256,) i32 — quad-packed planes (_pack_matrix_quads)
    targets_ref,  # VMEM (B, N) i32
    lens_ref,     # VMEM (B, 1) i32
    out_ref,      # VMEM (B, 1) i32
    planes_scr,   # VMEM (26, B, N) int8
    h_scr,        # VMEM (B, N) i32
    f_scr,        # VMEM (B, N) i32
    best_scr,     # VMEM (B, N) i32
    *,
    mode: str,
    go: int,
    ge: int,
):
    B, N = h_scr.shape
    col = jax.lax.broadcasted_iota(jnp.int32, (B, N), 1)   # j-1 (j = 1..N)

    # ---- prologue: substitution planes via quad-packed 5-bit select tree
    # (no gather; 7 trees for 26 planes — see _pack_matrix_quads)
    t = targets_ref[:]
    bits = [(t >> k) & 1 != 0 for k in range(5)]
    _build_planes(planes_scr, m32_ref, bits)

    free_top = mode in ("SW", "HW", "OV")
    free_left = mode in ("SW", "OV")
    local = mode == "SW"

    if free_top:
        h_scr[:] = jnp.zeros((B, N), jnp.int32)
    else:  # NW: H[0, j] = -(go + (j-1) ge)
        h_scr[:] = -(go + col * ge)
    f_scr[:] = jnp.full((B, N), NEG, jnp.int32)
    best_scr[:] = jnp.full((B, N), NEG if not local else 0, jnp.int32)

    n_rounds = max(1, (N - 1).bit_length())
    jge1 = (col + 1) * ge          # loop-invariant: + j*ge term of the prefix
    goge = go + col * ge           # loop-invariant: go + (j-1)*ge decay

    def row_body(i, _):
        c = q_ref[i]
        s = planes_scr[c].astype(jnp.int32)                # (B, N)
        hp = h_scr[:]
        fp = f_scr[:]

        if free_left:
            left0 = jnp.int32(0)          # X_0 = H[i1, 0]
            left0_prev = jnp.int32(0)     # H[i1-1, 0] (diag source at j=1)
        else:
            left0 = -(go + i * ge)                         # i1-1 = i
            left0_prev = jnp.where(i == 0, 0, -(go + (i - 1) * ge))

        f = jnp.maximum(hp - go, fp - ge)
        # diag_j = H[i-1, j-1]: shift right one lane, boundary at j=1
        diag = pltpu.roll(hp, 1, axis=1)
        diag = jnp.where(col == 0, left0_prev, diag)
        g = jnp.maximum(diag + s, f)
        if local:
            g = jnp.maximum(g, 0)

        # E_j = max(X_0, max_{1<=k<j}(G_k + k ge)) - go - (j-1) ge
        cmax = g + jge1
        for r in range(n_rounds):
            k = 1 << r
            rolled = pltpu.roll(cmax, k, axis=1)
            cmax = jnp.maximum(cmax, jnp.where(col < k, NEG, rolled))
        cm1 = jnp.where(col < 1, NEG, pltpu.roll(cmax, 1, axis=1))
        e = jnp.maximum(left0, cm1) - goge
        h = jnp.maximum(g, e)

        h_scr[:] = h
        f_scr[:] = f
        if local:
            best_scr[:] = jnp.maximum(best_scr[:], h)
        elif mode == "OV":
            # last-column best: H[i1, len_b] competes per row
            best_scr[:] = jnp.maximum(
                best_scr[:], jnp.where(col == lens_ref[:] - 1, h, NEG)
            )
        return 0

    jax.lax.fori_loop(0, qlen_ref[0], row_body, 0, unroll=False)

    lens = lens_ref[:]                                     # (B, 1)
    col_valid = col < lens
    hfin = h_scr[:]
    if mode == "SW":
        out = jnp.max(jnp.where(col_valid, best_scr[:], 0), axis=1, keepdims=True)
        # empty target => score 0 handled by the zero floor
    elif mode == "NW":
        out = jnp.max(jnp.where(col == lens - 1, hfin, NEG), axis=1, keepdims=True)
    elif mode == "HW":
        out = jnp.max(jnp.where(col_valid, hfin, NEG), axis=1, keepdims=True)
    else:  # OV: best of final row, last column, and the free top boundary
        #      H[0, n] = 0 (xla.py folds it in via last_col_init).
        row_best = jnp.max(jnp.where(col_valid, hfin, NEG), axis=1, keepdims=True)
        col_best = jnp.max(best_scr[:], axis=1, keepdims=True)
        out = jnp.maximum(jnp.maximum(row_best, col_best), 0)
    out_ref[:] = out


def _sw_grouped_kernel(
    q_ref,        # SMEM (Qm,) i32 — concatenated padded query codes
    qoff_ref,     # SMEM (G,) i32 — per-group offset into q_ref
    qlen_ref,     # SMEM (G,) i32 — per-group query length
    m32_ref,      # SMEM (256,) i32 quad-packed
    *rest,        # non-resident: targets(1,B,N) VMEM, lens, out, 4 scratch
                  # resident: db(n_slots,8,128) HBM, tstart(1,1,B) SMEM
                  #           slot indices, lens, out, slab(B,ns,8,128) u8 +
                  #           tstage(B,N) u8 + DMA sem + 4 scratch
    mode: str,
    go: int,
    ge: int,
    dt=jnp.int32,
    neg: int = NEG,
    shift_impl: str = "roll",
    unroll: int = 1,
    resident: bool = False,
    dma_pipeline: bool = False,
):
    """Grid-of-groups variant: one launch scores G (query, target-batch)
    pairs.  Kernel launches cost ~30 ms each through a remote-attached
    runtime (measured, with no dispatch overlap), so per-call work must be
    large; the grid also double-buffers the HBM->VMEM target loads.

    ``dt`` is the DP accumulator dtype: int16 doubles VPU element density
    and is exact whenever max_qlen*max_substitution + go + N*ge stays well
    inside the int16 range — but Mosaic cannot legalize i16 vector maxsi
    on v5e (measured 2026-08-17), so the gate stays off on hardware.

    ``unroll=u`` runs u query rows per loop iteration (amortizes the
    per-iteration scalar/loop overhead; up to u-1 remainder rows run
    under pl.when) — A/B knob for hardware measurement.

    ``resident=True`` reads target rows from the HBM-RESIDENT database
    codes array instead of a host-shipped (G, B, N) slab: per row, a
    dynamic-offset DMA copies N bytes starting at the row's flat offset
    into the VMEM slab (a bounded lag window keeps ~16 DMAs in flight).
    Rows may read past their sequence's end into neighboring sequences —
    the same already-proven invariant as the native packer's
    uninitialized tails (pack.cpp): the DP output is length-masked, so
    garbage beyond ``len`` never reaches a valid column."""
    g = pl.program_id(0)
    if resident and dma_pipeline:
        (db_ref, tstart_ref, tnext_ref, lens_ref, out_ref,
         slab_scr, tstage_scr, dma_sem, planes_scr, h_scr, f_scr,
         best_scr) = rest
    elif resident:
        (db_ref, tstart_ref, lens_ref, out_ref,
         slab_scr, tstage_scr, dma_sem, planes_scr, h_scr, f_scr,
         best_scr) = rest
    else:
        (targets_ref, lens_ref, out_ref,
         planes_scr, h_scr, f_scr, best_scr) = rest
    B, N = h_scr.shape
    col = jax.lax.broadcasted_iota(jnp.int32, (B, N), 1)

    if resident and dma_pipeline:
        # Double-buffered assembly: group g+1's row DMAs are issued BEFORE
        # group g's DP, so the transfers ride under the compute (grid steps
        # run sequentially; scratch persists — same parity pattern as the
        # long kernel's edge carries).  slab_scr is (2, B, ns, 8, 128) and
        # dma_sem is (2,); see the non-pipelined branch for the layout
        # rules that shape the slab and the slot-index offsets.
        ns = slab_scr.shape[2]
        cur = g % 2
        nxt = (g + 1) % 2

        def _issue(tref, buf):
            def body(b, _):
                pltpu.make_async_copy(
                    db_ref.at[pl.ds(tref[0, 0, b], ns)],
                    slab_scr.at[buf, b],
                    dma_sem.at[buf],
                ).start()
                return 0

            jax.lax.fori_loop(0, B, body, 0, unroll=False)

        @pl.when(g == 0)
        def _():
            _issue(tstart_ref, 0)

        @pl.when(g + 1 < pl.num_programs(0))
        def _():
            _issue(tnext_ref, nxt)

        def _wait_body(b, _):
            # descriptor only carries the byte count + semaphore; the
            # source slice is immaterial for the wait
            pltpu.make_async_copy(
                db_ref.at[pl.ds(0, ns)], slab_scr.at[cur, b], dma_sem.at[cur]
            ).wait()
            return 0

        jax.lax.fori_loop(0, B, _wait_body, 0, unroll=False)
    elif resident:
        LAG = 16  # outstanding DMAs: enough to hide HBM latency, small
                  # enough to stay inside the DMA queue
        # Layout dance forced by the Mosaic DMA rules (all measured, v5e):
        # flat u8 HBM slices need 1024-aligned offsets AND sizes, 2-D VMEM
        # destination rows need 8-sublane granularity — so both sides are
        # shaped so every dynamic index sits on dimension 0 ABOVE full
        # (8, 128) tiles: the database is (n_slots, 8, 128) (one 1024-byte
        # slot per row) and the slab is (B, ns, 8, 128) (ns slots per
        # target window).  Offsets ship as SLOT indices (a runtime byte
        # offset cannot be PROVEN 1024-divisible by the compiler).
        ns = slab_scr.shape[1]

        def _dma_start(b):
            pltpu.make_async_copy(
                db_ref.at[pl.ds(tstart_ref[0, 0, b], ns)],
                slab_scr.at[b],
                dma_sem,
            ).start()

        def _dma_wait(b):
            # descriptor only carries the byte count + semaphore; the
            # source slice is immaterial for the wait
            pltpu.make_async_copy(
                db_ref.at[pl.ds(0, ns)], slab_scr.at[b], dma_sem
            ).wait()

        def _copy_body(i, _):
            @pl.when(i < B)
            def _():
                _dma_start(i)

            @pl.when(i >= LAG)
            def _():
                _dma_wait(i - LAG)

            return 0

        jax.lax.fori_loop(0, B + LAG, _copy_body, 0, unroll=False)

    # upcast int8 codes once — bit-mask i1 vectors derived from int8 hit a
    # Mosaic relayout bug ("Non-singleton logical dimension is replicated")
    if resident:
        # assemble (B, N) target codes from the slab's 128-lane segments.
        # Staged through scratch with static lane-slice STORES: each
        # slab_scr[:, slot, sub, :] slice carries a different sublane
        # phase in its layout, and Mosaic cannot concat those directly
        # ("result/input offset mismatch on non-concat dimension") — a
        # store normalizes the layout.
        for s in range(N // 128):
            if dma_pipeline:
                tstage_scr[:, s * 128 : (s + 1) * 128] = slab_scr[cur, :, s // 8, s % 8, :]
            else:
                tstage_scr[:, s * 128 : (s + 1) * 128] = slab_scr[:, s // 8, s % 8, :]
        t = tstage_scr[:].astype(jnp.int32)
    else:
        t = targets_ref[0].astype(jnp.int32)
    bits = [(t >> k) & 1 != 0 for k in range(5)]
    _build_planes(planes_scr, m32_ref, bits)

    free_top = mode in ("SW", "HW", "OV")
    free_left = mode in ("SW", "OV")
    local = mode == "SW"

    if free_top:
        h_scr[:] = jnp.zeros((B, N), dt)
    else:
        h_scr[:] = (-(go + col * ge)).astype(dt)
    f_scr[:] = jnp.full((B, N), neg, dt)
    best_scr[:] = jnp.full((B, N), neg if not local else 0, dt)

    n_rounds = max(1, (N - 1).bit_length())
    jge1 = ((col + 1) * ge).astype(dt)
    goge = (go + col * ge).astype(dt)
    qoff = qoff_ref[g]
    lens01 = lens_ref[0]                                   # (B, 1)

    if shift_impl == "concat":
        # static-slice shift: 2 ops/round (concat+max) vs roll's 3
        # (roll+where+max); also the only choice for 16-bit accumulators
        # (Mosaic cannot lower tpu.dynamic_rotate on non-32-bit vectors)
        def shift_neg(x, k):
            return jnp.concatenate(
                [jnp.full((B, k), neg, dt), x[:, : N - k]], axis=1
            )

        def shift1(x):
            return jnp.concatenate([x[:, :1], x[:, : N - 1]], axis=1)
    else:
        def shift_neg(x, k):
            return jnp.where(col < k, neg, pltpu.roll(x, k, axis=1))

        def shift1(x):
            return pltpu.roll(x, 1, axis=1)

    def row_body(i, _):
        c = q_ref[qoff + i]
        s = planes_scr[c].astype(dt)
        hp = h_scr[:]
        fp = f_scr[:]
        if free_left:
            left0 = jnp.zeros((), dt)
            left0_prev = jnp.zeros((), dt)
        else:
            left0 = (-(go + i * ge)).astype(dt)
            left0_prev = jnp.where(i == 0, 0, -(go + (i - 1) * ge)).astype(dt)
        f = jnp.maximum(hp - go, fp - ge)
        diag = jnp.where(col == 0, left0_prev, shift1(hp))
        g_ = jnp.maximum(diag + s, f)
        if local:
            g_ = jnp.maximum(g_, 0)
        cmax = g_ + jge1
        for r in range(n_rounds):
            cmax = jnp.maximum(cmax, shift_neg(cmax, 1 << r))
        cm1 = shift_neg(cmax, 1)
        e = jnp.maximum(left0, cm1) - goge
        h = jnp.maximum(g_, e)
        h_scr[:] = h
        f_scr[:] = f
        if local:
            best_scr[:] = jnp.maximum(best_scr[:], h)
        elif mode == "OV":
            best_scr[:] = jnp.maximum(
                best_scr[:], jnp.where(col == lens01 - 1, h, neg)
            )
        return 0

    qlen = qlen_ref[g]
    if unroll <= 1:
        jax.lax.fori_loop(0, qlen, row_body, 0, unroll=False)
    else:
        def blk_body(k, _):
            for j in range(unroll):
                row_body(unroll * k + j, 0)
            return 0

        n_blk = qlen // unroll
        jax.lax.fori_loop(0, n_blk, blk_body, 0, unroll=False)

        base = n_blk * unroll
        for j in range(unroll - 1):
            @pl.when(base + j < qlen)
            def _(j=j):
                row_body(base + j, 0)

    # final reductions in int32: Mosaic does not lower int16 reductions
    col_valid = col < lens01
    hfin = h_scr[:].astype(jnp.int32)
    bestf = best_scr[:].astype(jnp.int32)
    if mode == "SW":
        out = jnp.max(jnp.where(col_valid, bestf, 0), axis=1, keepdims=True)
    elif mode == "NW":
        out = jnp.max(jnp.where(col == lens01 - 1, hfin, NEG), axis=1, keepdims=True)
    elif mode == "HW":
        out = jnp.max(jnp.where(col_valid, hfin, NEG), axis=1, keepdims=True)
    else:  # OV
        row_best = jnp.max(jnp.where(col_valid, hfin, NEG), axis=1, keepdims=True)
        col_best = jnp.max(bestf, axis=1, keepdims=True)
        out = jnp.maximum(jnp.maximum(row_best, col_best), 0)
    out_ref[0] = out


def _sw_grouped_long_kernel(
    q_ref,        # SMEM (Qm,) i32
    qoff_ref,     # SMEM (G,) i32
    qlen_ref,     # SMEM (G,) i32
    m32_ref,      # SMEM (256,) i32 quad-packed
    targets_ref,  # VMEM (1, B, Nc) i32 — this (group, column-chunk) block
    lens_ref,     # VMEM (1, B, 1) i32 — absolute target lengths
    out_ref,      # VMEM (1, B, 1) i32 — accumulated across column chunks
    planes_scr,   # VMEM (26, B, Nc) int8
    h_scr,        # VMEM (B, Nc) i32
    f_scr,        # VMEM (B, Nc) i32
    best_scr,     # VMEM (B, Nc) i32
    edge_h_scr,   # VMEM (2, M1, B) i32 — per-row H at the chunk's last column
    edge_p_scr,   # VMEM (2, M1, B) i32 — per-row decayed-prefix-max carry
    *,
    mode: str,
    go: int,
    ge: int,
):
    """Long-target variant: the column axis is processed in VMEM-sized
    chunks with per-row carries between chunks — H at the chunk edge (the
    next chunk's first-column diagonal) and the decayed-prefix-max
    accumulator (the E term's absolute-column prefix), double-buffered by
    chunk parity.  F flows only downward and needs no cross-chunk carry.
    Grid = (G, n_chunks), last axis fastest, so each group's chunks run
    left to right."""
    g = pl.program_id(0)
    cidx = pl.program_id(1)
    B, Nc = h_scr.shape
    col = jax.lax.broadcasted_iota(jnp.int32, (B, Nc), 1)
    c0 = cidx * Nc
    col_abs = col + c0

    cur = cidx % 2
    prev = (cidx + 1) % 2

    t = targets_ref[0].astype(jnp.int32)
    bits = [(t >> k) & 1 != 0 for k in range(5)]
    _build_planes(planes_scr, m32_ref, bits)

    free_top = mode in ("SW", "HW", "OV")
    free_left = mode in ("SW", "OV")
    local = mode == "SW"

    if free_top:
        h_scr[:] = jnp.zeros((B, Nc), jnp.int32)
        top_edge = jnp.int32(0)
    else:  # NW: H[0, j] = -(go + (j-1) ge), absolute j
        h_scr[:] = -(go + col_abs * ge)
        top_edge = -(go + (c0 + Nc - 1) * ge)
    f_scr[:] = jnp.full((B, Nc), NEG, jnp.int32)
    best_scr[:] = jnp.full((B, Nc), NEG if not local else 0, jnp.int32)
    # boundary-row (i1 = 0) edge for the NEXT chunk's row-1 diagonal
    edge_h_scr[cur, 0] = jnp.full((B,), top_edge, jnp.int32)

    n_rounds = max(1, (Nc - 1).bit_length())
    jge1 = (col_abs + 1) * ge
    goge = go + col_abs * ge
    qoff = qoff_ref[g]
    lens01 = lens_ref[0]                                   # (B, 1)

    def row_body(i, _):
        i1 = i + 1
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
        diag = pltpu.roll(hp, 1, axis=1)
        # first local column's diagonal: previous chunk's edge H of row i1-1
        # (chunk 0 uses the analytic left boundary)
        diag0 = jnp.where(
            cidx == 0, jnp.full((B,), left0_prev, jnp.int32), edge_h_scr[prev, i1 - 1]
        )
        diag = jnp.where(col == 0, diag0[:, None], diag)
        g_ = jnp.maximum(diag + s, f)
        if local:
            g_ = jnp.maximum(g_, 0)
        cmax = g_ + jge1
        for r in range(n_rounds):
            k = 1 << r
            cmax = jnp.maximum(cmax, jnp.where(col < k, NEG, pltpu.roll(cmax, k, axis=1)))
        cm1 = jnp.where(col < 1, NEG, pltpu.roll(cmax, 1, axis=1))
        # incoming decayed-prefix carry: X_0 analytically at chunk 0, the
        # stored absolute-column accumulator afterwards
        carry_b = jnp.where(
            cidx == 0, jnp.full((B,), left0, jnp.int32), edge_p_scr[prev, i1]
        )
        e = jnp.maximum(carry_b[:, None], cm1) - goge
        h = jnp.maximum(g_, e)
        h_scr[:] = h
        f_scr[:] = f
        edge_h_scr[cur, i1] = h[:, Nc - 1]
        edge_p_scr[cur, i1] = jnp.maximum(carry_b, cmax[:, Nc - 1])
        if local:
            best_scr[:] = jnp.maximum(best_scr[:], h)
        elif mode == "OV":
            best_scr[:] = jnp.maximum(
                best_scr[:], jnp.where(col_abs == lens01 - 1, h, NEG)
            )
        return 0

    jax.lax.fori_loop(0, qlen_ref[g], row_body, 0, unroll=False)

    col_valid = col_abs < lens01
    hfin = h_scr[:]
    bestf = best_scr[:]
    if mode == "SW":
        out = jnp.max(jnp.where(col_valid, bestf, 0), axis=1, keepdims=True)
    elif mode == "NW":
        out = jnp.max(jnp.where(col_abs == lens01 - 1, hfin, NEG), axis=1, keepdims=True)
    elif mode == "HW":
        out = jnp.max(jnp.where(col_valid, hfin, NEG), axis=1, keepdims=True)
    else:  # OV
        row_best = jnp.max(jnp.where(col_valid, hfin, NEG), axis=1, keepdims=True)
        col_best = jnp.max(bestf, axis=1, keepdims=True)
        out = jnp.maximum(jnp.maximum(row_best, col_best), 0)

    @pl.when(cidx == 0)
    def _():
        out_ref[0] = out

    @pl.when(cidx > 0)
    def _():
        out_ref[0] = jnp.maximum(out_ref[0], out)


@partial(
    jax.jit,
    static_argnames=("mode", "gap_open", "gap_extend", "n_chunk", "m_cap"),
)
def sw_scores_pallas_grouped_long(
    q_codes_all: jnp.ndarray,   # (Qm,) int32
    q_offsets: jnp.ndarray,     # (G,) int32
    q_lens: jnp.ndarray,        # (G,) int32
    targets: jnp.ndarray,       # (G, B, N) int8, N a multiple of n_chunk
    target_lens: jnp.ndarray,   # (G, B) int32
    matrix32: jnp.ndarray,      # (32, 32) int32
    *,
    mode: str = "SW",
    gap_open: int = 10,
    gap_extend: int = 1,
    n_chunk: int = 512,
    m_cap: int = 2048,
) -> jnp.ndarray:
    """Long-target grouped scores: columns processed in n_chunk slices with
    per-row carries.  ``m_cap`` bounds query length (edge scratch rows)."""
    G, B, N = targets.shape
    assert N % n_chunk == 0, "N must be a multiple of n_chunk"
    n_chunks = N // n_chunk
    m32_flat = _pack_matrix_quads(matrix32)
    lens3 = target_lens.astype(jnp.int32).reshape(G, B, 1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(G, n_chunks),
        in_specs=[
            pl.BlockSpec(
                (1, B, n_chunk), lambda g, c, *_: (g, 0, c), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((1, B, 1), lambda g, c, *_: (g, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, B, 1), lambda g, c, *_: (g, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((26, B, n_chunk), jnp.int8),
            pltpu.VMEM((B, n_chunk), jnp.int32),
            pltpu.VMEM((B, n_chunk), jnp.int32),
            pltpu.VMEM((B, n_chunk), jnp.int32),
            pltpu.VMEM((2, m_cap + 1, B), jnp.int32),
            pltpu.VMEM((2, m_cap + 1, B), jnp.int32),
        ],
    )
    out = pl.pallas_call(
        partial(_sw_grouped_long_kernel, mode=mode, go=gap_open, ge=gap_extend),
        out_shape=jax.ShapeDtypeStruct((G, B, 1), jnp.int32),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(
        q_codes_all.astype(jnp.int32),
        q_offsets.astype(jnp.int32),
        q_lens.astype(jnp.int32),
        m32_flat,
        targets.astype(jnp.int8),
        lens3,
    )
    return out[:, :, 0]


NEG16 = -16000


@partial(
    jax.jit,
    static_argnames=(
        "mode", "gap_open", "gap_extend", "max_qlen", "max_sub", "shift_impl",
        "acc", "unroll",
    ),
)
def sw_scores_pallas_grouped(
    q_codes_all: jnp.ndarray,   # (Qm,) int32 concatenated padded queries
    q_offsets: jnp.ndarray,     # (G,) int32
    q_lens: jnp.ndarray,        # (G,) int32
    targets: jnp.ndarray,       # (G, B, N) int8 codes (int8 quarters the
                                # host->device transfer, which is fresh every
                                # database chunk)
    target_lens: jnp.ndarray,   # (G, B) int32
    matrix32: jnp.ndarray,      # (32, 32) int32
    *,
    mode: str = "SW",
    gap_open: int = 10,
    gap_extend: int = 1,
    max_qlen: int = 0,
    max_sub: int = 0,
    shift_impl: str = "roll",
    acc: str = "int",
    unroll: int = 2,
) -> jnp.ndarray:
    """Scores (G, B) int32: group g = query g vs its B padded targets.

    ``unroll=2`` (production default) runs two query rows per loop
    iteration — measured 48.7 vs 46.7 GCUPS for unroll=1 at the bench
    shape on v5e (2026-08-17, tools/bench_ab.py unroll); bit-parity with
    unroll=1 is property-tested in interpret mode.

    ``acc`` picks the DP accumulator: "int" (int32, default), "i16"
    (int16, 2x VPU element density — requires static bounds ``max_qlen``
    over all groups and ``max_sub`` = max substitution score so every DP
    value provably fits; forces concat-shifts since Mosaic lacks 16-bit
    rotates), or "f32".  Results are bit-identical across all three.
    """
    G, B, N = targets.shape
    i16_admissible = (
        max_qlen > 0
        and max_sub > 0
        and max_qlen * max_sub + gap_open + (N + 1) * gap_extend < -NEG16 // 2
    )
    if acc == "i16":
        # int16 DP is exact under the static bound above (the wrapper
        # refuses otherwise).  Mosaic cannot lower tpu.dynamic_rotate on
        # 16-bit vectors ("not implemented: Rotate with non-32-bit data",
        # v5e), so the int16 kernel uses concat-shifts exclusively.
        assert i16_admissible, (
            "acc='i16' needs max_qlen/max_sub bounds that keep the DP "
            "inside int16"
        )
        dt, neg = jnp.int16, NEG16
        shift_impl = "concat"
    elif acc == "f32":
        # float32 DP is exact for |values| < 2^24 (scores are far below);
        # A/B knob for VPU f32-vs-i32 throughput
        dt, neg = jnp.float32, -(1 << 22)
    else:
        # "int": int32 (the production default); int16 is opt-in via
        # acc="i16" until it proves out on real hardware.
        dt, neg = jnp.int32, NEG
    m32_flat = _pack_matrix_quads(matrix32)
    lens3 = target_lens.astype(jnp.int32).reshape(G, B, 1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(G,),
        in_specs=[
            pl.BlockSpec((1, B, N), lambda g, *_: (g, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, 1), lambda g, *_: (g, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, B, 1), lambda g, *_: (g, 0, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((26, B, N), jnp.int8),
            pltpu.VMEM((B, N), dt),
            pltpu.VMEM((B, N), dt),
            pltpu.VMEM((B, N), dt),
        ],
    )
    out = pl.pallas_call(
        partial(
            _sw_grouped_kernel,
            mode=mode,
            go=gap_open,
            ge=gap_extend,
            dt=dt,
            neg=neg,
            shift_impl=shift_impl,
            unroll=unroll,
        ),
        out_shape=jax.ShapeDtypeStruct((G, B, 1), jnp.int32),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(
        q_codes_all.astype(jnp.int32),
        q_offsets.astype(jnp.int32),
        q_lens.astype(jnp.int32),
        m32_flat,
        targets.astype(jnp.int8),
        lens3,
    )
    return out[:, :, 0]


@partial(
    jax.jit,
    static_argnames=(
        "n_pad", "mode", "gap_open", "gap_extend", "shift_impl", "unroll",
        "dma_pipeline",
    ),
)
def sw_scores_pallas_grouped_resident(
    q_codes_all: jnp.ndarray,   # (Qm,) int32 concatenated padded queries
    q_offsets: jnp.ndarray,     # (G,) int32
    q_lens: jnp.ndarray,        # (G,) int32
    db_flat: jnp.ndarray,       # (R,) uint8 — HBM-resident database codes,
                                # padded by >= n_pad tail bytes (rows may
                                # read past the last sequence)
    t_starts: jnp.ndarray,      # (G, B) int32 flat BYTE offsets into
                                # db_flat — MUST be 1024-byte aligned (the
                                # ResidentDB slot grain); unaligned values
                                # silently round down
    target_lens: jnp.ndarray,   # (G, B) int32
    matrix32: jnp.ndarray,      # (32, 32) int32
    n_pad: int = 512,           # static target window (the length rung)
    *,
    mode: str = "SW",
    gap_open: int = 10,
    gap_extend: int = 1,
    shift_impl: str = "roll",
    unroll: int = 2,
    dma_pipeline: bool = False,
) -> jnp.ndarray:
    """Scores (G, B) int32 against the HBM-RESIDENT database.

    The host ships only (G, B) offset/length int32 arrays per launch
    (~8 KB/group) instead of (G, B, N) target bytes (~0.5 MB/group): on
    remote-attached runtimes measured at 0.03-1 GB/s device_put the slab
    transfer dominates the align phase at many-query scale, while the
    resident array uploads once per process (and stays warm across serve
    jobs).  Target slabs are assembled in-kernel by per-row dynamic-offset
    DMA from ``db_flat``; exactness vs the slab kernel is property-tested
    (garbage past a row's length is masked — the same invariant as the
    native packer's uninitialized tails).  int32 offsets bound the
    resident array at 2 GiB - n_pad; callers segment larger databases.

    ``dma_pipeline=True`` double-buffers the slab: group g+1's row DMAs
    are issued before group g's DP so the transfers overlap compute.
    Measured a WASH on v5e (56.7 vs 56.8 ms at G=8 B=1024 N=512: the
    lag-16 assembly already costs only ~2 ms over a device-fed slab), so
    the simpler single buffer stays the default — docs/PLATFORM.md."""
    G, B = t_starts.shape
    N = n_pad
    ns = -(-N // 1024)  # 1024-byte slots per target window (ceil: the
                        # N=1536 rung needs 2 slots — floor staged only
                        # 1024 bytes and the assembly indexed past ns)
    m32_flat = _pack_matrix_quads(matrix32)
    lens3 = target_lens.astype(jnp.int32).reshape(G, B, 1)
    # (n_slots, 8, 128): every dynamic DMA index sits on dim 0 above full
    # (8, 128) tiles (see the kernel's layout note)
    db3 = db_flat.reshape(-1, 8, 128)
    tstarts3 = (t_starts.astype(jnp.int32) // 1024).reshape(G, 1, B)

    # (G, 1, B) so the trailing block dims (1, B) satisfy Mosaic's
    # block-shape rule (dim -2 equals the full array dim)
    tstart_spec = pl.BlockSpec(
        (1, 1, B), lambda g, *_: (g, 0, 0), memory_space=pltpu.SMEM
    )
    in_specs = [
        pl.BlockSpec(memory_space=pl.ANY),                 # db slots (HBM)
        tstart_spec,
    ]
    inputs = [db3, tstarts3]
    if dma_pipeline:
        # second view of the SAME starts, one group ahead (clamped at the
        # last group, where it is never issued)
        in_specs.append(
            pl.BlockSpec(
                (1, 1, B),
                lambda g, *_: (jnp.minimum(g + 1, G - 1), 0, 0),
                memory_space=pltpu.SMEM,
            )
        )
        inputs.append(tstarts3)
        slab_scratch = pltpu.VMEM((2, B, ns, 8, 128), jnp.uint8)
        sem_scratch = pltpu.SemaphoreType.DMA((2,))
    else:
        slab_scratch = pltpu.VMEM((B, ns, 8, 128), jnp.uint8)
        sem_scratch = pltpu.SemaphoreType.DMA(())
    in_specs.append(
        pl.BlockSpec((1, B, 1), lambda g, *_: (g, 0, 0), memory_space=pltpu.VMEM)
    )
    inputs.append(lens3)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(G,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, B, 1), lambda g, *_: (g, 0, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[
            slab_scratch,                                  # assembled slab
            pltpu.VMEM((B, N), jnp.uint8),                 # layout staging
            sem_scratch,                                   # row-copy sem(s)
            pltpu.VMEM((26, B, N), jnp.int8),
            pltpu.VMEM((B, N), jnp.int32),
            pltpu.VMEM((B, N), jnp.int32),
            pltpu.VMEM((B, N), jnp.int32),
        ],
    )
    out = pl.pallas_call(
        partial(
            _sw_grouped_kernel,
            mode=mode,
            go=gap_open,
            ge=gap_extend,
            dt=jnp.int32,
            neg=NEG,
            shift_impl=shift_impl,
            unroll=unroll,
            resident=True,
            dma_pipeline=dma_pipeline,
        ),
        out_shape=jax.ShapeDtypeStruct((G, B, 1), jnp.int32),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(
        q_codes_all.astype(jnp.int32),
        q_offsets.astype(jnp.int32),
        q_lens.astype(jnp.int32),
        m32_flat,
        *inputs,
    )
    return out[:, :, 0]


@partial(jax.jit, static_argnames=("mode", "gap_open", "gap_extend"))
def sw_scores_pallas(
    query_codes: jnp.ndarray,   # (m_pad,) int32 (PAD_CODE beyond query_len)
    query_len: jnp.ndarray,     # () int32
    targets: jnp.ndarray,       # (B, N) int32
    target_lens: jnp.ndarray,   # (B,) int32
    matrix32: jnp.ndarray,      # (32, 32) int32
    *,
    mode: str = "SW",
    gap_open: int = 10,
    gap_extend: int = 1,
) -> jnp.ndarray:
    """Alignment scores (B,) int32 of one query vs B padded targets."""
    B, N = targets.shape
    m32_flat = _pack_matrix_quads(matrix32)
    qlen = jnp.reshape(query_len.astype(jnp.int32), (1,))
    lens2 = target_lens.astype(jnp.int32).reshape(B, 1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),   # targets
            pl.BlockSpec(memory_space=pltpu.VMEM),   # lens
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((26, B, N), jnp.int8),
            pltpu.VMEM((B, N), jnp.int32),
            pltpu.VMEM((B, N), jnp.int32),
            pltpu.VMEM((B, N), jnp.int32),
        ],
    )
    out = pl.pallas_call(
        partial(_sw_kernel, mode=mode, go=gap_open, ge=gap_extend),
        out_shape=jax.ShapeDtypeStruct((B, 1), jnp.int32),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(
        query_codes.astype(jnp.int32),
        qlen,
        m32_flat,
        targets.astype(jnp.int32),
        lens2,
    )
    return out[:, 0]
