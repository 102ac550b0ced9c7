"""Multi-chip scaling: database-sharded scoring with global top-k merge.

The reference's only parallelism is a pthread pool splitting each database
chunk into contiguous ranges with a host-side merge of per-thread top-k
lists (database_search.cpp:101-154) plus optional multi-GPU card lists for
the SW rescoring (database_alignment.cpp:80-86).  The TPU-native mapping
(SURVEY.md §2.3):

* the candidate/target axis is sharded over a 1-D ``jax.sharding.Mesh``
  axis ``"db"``; each device scores its shard with the same unjitted core
  used single-chip (align/xla.py);
* per-shard ``lax.top_k`` then an ``all_gather`` over ICI and a global
  re-top-k replace the host merge — the collective payload is O(k), not
  O(B), so the merge rides the interconnect at trivial cost;
* global candidate indices are recovered from shard-local ones with
  ``lax.axis_index`` offsets, mirroring the chunk-offset bookkeeping at
  database_search.cpp:208.

Everything is a single jitted SPMD program: XLA lays out the collectives,
no host round trips between scoring and merging.
"""

from __future__ import annotations


from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..align.xla import align_scores

DB_AXIS = "db"


def make_mesh(n_devices: Optional[int] = None, axis: str = DB_AXIS) -> Mesh:
    """1-D device mesh over the database axis."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis,))


def make_sharded_topk_align(
    mesh: Mesh,
    *,
    k: int,
    mode: str = "SW",
    gap_open: int = 10,
    gap_extend: int = 1,
    axis: str = DB_AXIS,
):
    """Build a jitted SPMD step: score B sharded targets, return global top-k.

    Returned fn signature::

        fn(query_codes (m_pad,) i32, query_len () i32,
           targets (B, N) i32 sharded on axis 0, target_lens (B,) i32 sharded,
           matrix32 (32, 32) i32 replicated)
          -> (scores (B,) i32 sharded, topk_scores (k,) i32, topk_idx (k,) i32)

    ``B`` must be divisible by the mesh size; the caller pads with dummy
    targets (length 0 scores are the mode's worst case and fall out of the
    top-k).  ``k`` must be <= B // mesh_size so the per-shard top-k is
    well-formed; the global merge re-tops over the gathered n_dev*k pool.
    """
    n_dev = mesh.devices.size

    def local_step(q, ql, t, tl, m32):
        scores = align_scores(
            q, ql, t, tl, m32, mode=mode, gap_open=gap_open, gap_extend=gap_extend
        )
        b_local = t.shape[0]
        kk = min(k, b_local)
        s, i = jax.lax.top_k(scores, kk)
        shard = jax.lax.axis_index(axis)
        gi = i.astype(jnp.int32) + shard.astype(jnp.int32) * b_local
        # O(k) collective over ICI; every shard computes the same global merge
        s_all = jax.lax.all_gather(s, axis)    # (n_dev, kk)
        gi_all = jax.lax.all_gather(gi, axis)  # (n_dev, kk)
        pool = s_all.reshape(-1)
        sg, pos = jax.lax.top_k(pool, min(k, pool.shape[0]))
        return scores, sg, gi_all.reshape(-1)[pos]

    fn = jax.shard_map(
        local_step,
        mesh=mesh,
        in_specs=(P(), P(), P(axis, None), P(axis), P()),
        out_specs=(P(axis), P(), P()),
        check_vma=False,
    )
    return jax.jit(fn)


def make_sharded_scores(
    mesh: Mesh,
    *,
    mode: str = "SW",
    gap_open: int = 10,
    gap_extend: int = 1,
    axis: str = DB_AXIS,
    kernel: str = "xla",
):
    """Jitted SPMD scorer: full (B,) scores with targets sharded over ``axis``.

    Unlike :func:`make_sharded_topk_align` this returns every score — the
    pipeline's E-value filter needs them all (database_alignment.cpp:83-86
    filters by value threshold, not top-k).  ``kernel="pallas"`` runs the
    Mosaic kernel on each shard (the production multi-chip path on TPU);
    "xla" is the portable scan (CPU meshes, dryruns).
    """
    if kernel == "pallas":
        from ..align.pallas_sw import sw_scores_pallas as _score_fn
    else:
        _score_fn = align_scores

    def local_step(q, ql, t, tl, m32):
        return _score_fn(
            q, ql, t, tl, m32, mode=mode, gap_open=gap_open, gap_extend=gap_extend
        )

    fn = jax.shard_map(
        local_step,
        mesh=mesh,
        in_specs=(P(), P(), P(axis, None), P(axis), P()),
        out_specs=P(axis),
        check_vma=False,
    )
    return jax.jit(fn)


def make_2d_mesh(n_devices: Optional[int] = None, q_axis: str = "q", axis: str = DB_AXIS) -> Mesh:
    """2-D mesh: data-parallel query axis x database-shard axis.

    Factors the device count as (2, n/2) when even so both axes are
    exercised; a single device degenerates to (1, 1).
    """
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    nq = 2 if n % 2 == 0 and n > 1 else 1
    return Mesh(np.array(devices).reshape(nq, n // nq), (q_axis, axis))


def make_sharded_pipeline_step(
    mesh: Mesh,
    *,
    k: int,
    mode: str = "SW",
    gap_open: int = 10,
    gap_extend: int = 1,
    q_axis: str = "q",
    axis: str = DB_AXIS,
):
    """Batched-query SPMD step over a 2-D (q, db) mesh.

    Queries are data-parallel over ``q_axis`` (the TPU analogue of the
    reference's one-task-per-query pthread fan-out,
    select_alignments.cpp:55-65); the candidate axis is sharded over
    ``axis`` with a per-query global top-k merge as in
    :func:`make_sharded_topk_align`.

    fn(queries (Q, m_pad) i32, query_lens (Q,) i32,
       targets (B, N) i32, target_lens (B,) i32, matrix32 (32, 32) i32)
      -> (topk_scores (Q, k) i32, topk_idx (Q, k) i32)
    """

    def local_step(qs, qls, t, tl, m32):
        score_one = lambda q, ql: align_scores(
            q, ql, t, tl, m32, mode=mode, gap_open=gap_open, gap_extend=gap_extend
        )
        scores = jax.vmap(score_one)(qs, qls)          # (Q_loc, B_loc)
        b_local = t.shape[0]
        kk = min(k, b_local)
        s, i = jax.lax.top_k(scores, kk)               # (Q_loc, kk)
        shard = jax.lax.axis_index(axis)
        gi = i.astype(jnp.int32) + shard.astype(jnp.int32) * b_local
        s_all = jax.lax.all_gather(s, axis, axis=1)    # (Q_loc, n_db, kk)
        gi_all = jax.lax.all_gather(gi, axis, axis=1)
        pool = s_all.reshape(s.shape[0], -1)
        sg, pos = jax.lax.top_k(pool, min(k, pool.shape[1]))
        return sg, jnp.take_along_axis(gi_all.reshape(s.shape[0], -1), pos, axis=1)

    fn = jax.shard_map(
        local_step,
        mesh=mesh,
        in_specs=(P(q_axis, None), P(q_axis), P(axis, None), P(axis), P()),
        out_specs=(P(q_axis, None), P(q_axis, None)),
        check_vma=False,
    )
    return jax.jit(fn)


def shard_batch(mesh: Mesh, targets: np.ndarray, target_lens: np.ndarray, axis: str = DB_AXIS):
    """Place a padded (B, N) target batch sharded over the mesh's db axis."""
    t_sharding = NamedSharding(mesh, P(axis, None))
    l_sharding = NamedSharding(mesh, P(axis))
    return (
        jax.device_put(targets, t_sharding),
        jax.device_put(target_lens, l_sharding),
    )
