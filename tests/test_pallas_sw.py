"""Pallas kernel scores == NumPy oracle / XLA scan, all four modes.

Runs in Mosaic interpret mode on CPU (tests/conftest.py forces the cpu
platform); the same kernel compiles natively on TPU.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
from jax.experimental.pallas import tpu as pltpu

from sift4g_tpu.align.xla import PAD_CODE, _extend_matrix, align_scores_kernel
from sift4g_tpu.core.scorers import create_scorer


def _random_batch(rng, b, n, m_pad, qlen):
    targets = np.full((b, n), PAD_CODE, dtype=np.int32)
    lens = rng.integers(1, n + 1, size=b).astype(np.int32)
    for i in range(b):
        targets[i, : lens[i]] = rng.integers(0, 26, size=lens[i])
    q = np.full(m_pad, PAD_CODE, dtype=np.int32)
    q[:qlen] = rng.integers(0, 26, size=qlen)
    return q, targets, lens


@pytest.mark.parametrize("mode", ["SW", "NW", "HW", "OV"])
def test_pallas_matches_xla(mode):
    from sift4g_tpu.align.pallas_sw import sw_scores_pallas

    rng = np.random.default_rng(11)
    b, n, m_pad, qlen = 16, 128, 64, 57
    q, targets, lens = _random_batch(rng, b, n, m_pad, qlen)
    scorer = create_scorer("BLOSUM_62", 10, 1)
    m32 = _extend_matrix(scorer.matrix)

    ref = np.asarray(
        align_scores_kernel(q, np.int32(qlen), targets, lens, m32, mode=mode)
    )
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(
            sw_scores_pallas(q, np.int32(qlen), targets, lens, m32, mode=mode)
        )
    np.testing.assert_array_equal(got, ref)


def test_pallas_other_matrix_and_gaps():
    """Different scorer + gap params, SW mode."""
    from sift4g_tpu.align.pallas_sw import sw_scores_pallas

    rng = np.random.default_rng(23)
    b, n, m_pad, qlen = 8, 256, 32, 29
    q, targets, lens = _random_batch(rng, b, n, m_pad, qlen)
    scorer = create_scorer("BLOSUM_45", 12, 2)
    m32 = _extend_matrix(scorer.matrix)
    ref = np.asarray(
        align_scores_kernel(
            q, np.int32(qlen), targets, lens, m32, mode="SW", gap_open=12, gap_extend=2
        )
    )
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(
            sw_scores_pallas(
                q, np.int32(qlen), targets, lens, m32,
                mode="SW", gap_open=12, gap_extend=2,
            )
        )
    np.testing.assert_array_equal(got, ref)
