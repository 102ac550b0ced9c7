"""Pallas kernel inside shard_map (per-shard Mosaic scoring) on the CPU mesh."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
from jax.experimental.pallas import tpu as pltpu

from sift4g_tpu.align.xla import PAD_CODE, _extend_matrix, align_scores_kernel
from sift4g_tpu.core.scorers import create_scorer
from sift4g_tpu.parallel.sharded import make_mesh, make_sharded_scores, shard_batch


def test_sharded_pallas_scores_match():
    rng = np.random.default_rng(3)
    b, n, m_pad, qlen = 32, 128, 64, 41
    targets = np.full((b, n), PAD_CODE, dtype=np.int32)
    lens = rng.integers(1, n, size=b).astype(np.int32)
    for i in range(b):
        targets[i, : lens[i]] = rng.integers(0, 26, size=lens[i])
    q = np.full(m_pad, PAD_CODE, dtype=np.int32)
    q[:qlen] = rng.integers(0, 26, size=qlen)
    scorer = create_scorer("BLOSUM_62", 10, 1)
    m32 = _extend_matrix(scorer.matrix)

    ref = np.asarray(
        align_scores_kernel(q, np.int32(qlen), targets, lens, m32)
    )
    mesh = make_mesh(8)
    fn = make_sharded_scores(mesh, kernel="pallas")
    t_dev, l_dev = shard_batch(mesh, targets, lens)
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(fn(q, np.int32(qlen), t_dev, l_dev, m32))
    np.testing.assert_array_equal(got, ref)
