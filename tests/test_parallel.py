"""Sharded scoring + top-k merge equals the single-device path (8-dev CPU mesh)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from sift4g_tpu.align.xla import PAD_CODE, _extend_matrix, align_scores_kernel
from sift4g_tpu.core.scorers import create_scorer
from sift4g_tpu.parallel.sharded import make_mesh, make_sharded_topk_align, shard_batch


def _random_batch(rng, b, n, m):
    targets = np.full((b, n), PAD_CODE, dtype=np.int32)
    lens = rng.integers(5, n, size=b).astype(np.int32)
    for i in range(b):
        targets[i, : lens[i]] = rng.integers(0, 26, size=lens[i])
    q = np.full(m, PAD_CODE, dtype=np.int32)
    qlen = m - 3
    q[:qlen] = rng.integers(0, 26, size=qlen)
    return q, qlen, targets, lens


@pytest.mark.parametrize("mode", ["SW", "NW"])
def test_sharded_topk_matches_single_device(mode):
    assert len(jax.devices()) == 8, "conftest must provide 8 virtual devices"
    rng = np.random.default_rng(7)
    b, n, m, k = 64, 64, 32, 6
    q, qlen, targets, lens = _random_batch(rng, b, n, m)
    scorer = create_scorer("BLOSUM_62", 10, 1)
    m32 = _extend_matrix(scorer.matrix)

    ref = np.asarray(
        align_scores_kernel(q, np.int32(qlen), targets, lens, m32, mode=mode)
    )
    order = np.argsort(-ref, kind="stable")[:k]

    mesh = make_mesh(8)
    fn = make_sharded_topk_align(mesh, k=k, mode=mode)
    t_dev, l_dev = shard_batch(mesh, targets, lens)
    scores, topk_s, topk_i = fn(q, np.int32(qlen), t_dev, l_dev, m32)

    np.testing.assert_array_equal(np.asarray(scores), ref)
    np.testing.assert_array_equal(np.asarray(topk_s), ref[order])
    # indices must point at equal-scoring targets (tie order may differ)
    np.testing.assert_array_equal(ref[np.asarray(topk_i)], ref[order])


def test_mesh_sizes():
    for nd in (1, 2, 4, 8):
        mesh = make_mesh(nd)
        assert mesh.devices.size == nd
