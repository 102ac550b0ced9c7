"""JAX SIFT math agrees with the float64 NumPy oracle (CPU, f32 tolerance)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from sift4g_tpu.sift import scores as S
from sift4g_tpu.sift import scores_jax as SJ

X = ord("X") - ord("A")


def _random_alignment(rng, n, L):
    rows = rng.integers(0, 26, size=(n, L)).astype(np.uint8)
    # sprinkle X padding like real query-framed alignment strings
    mask = rng.random((n, L)) < 0.25
    rows[mask] = X
    rows[0] = rng.integers(0, 20, size=L)  # query row: standard letters
    return rows


@pytest.mark.parametrize("shape", [(5, 40), (40, 120), (2, 8)])
def test_sift_scores_jax_close_to_oracle(shape):
    rng = np.random.default_rng(9)
    rows = _random_alignment(rng, *shape)
    raw, _ = S.create_matrix(rows, np.ones(rows.shape[0]))

    want, w_weights, w_ndiff = S.calc_sift_scores(rows, raw)
    got, g_weights, g_ndiff = SJ.calc_sift_scores_jit(
        rows.astype(np.int32), raw.astype(np.float32)
    )
    np.testing.assert_array_equal(np.asarray(g_ndiff), w_ndiff)
    np.testing.assert_allclose(np.asarray(g_weights), w_weights, rtol=2e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-3, atol=2e-4)


def test_sift_scores_batch_vmap():
    rng = np.random.default_rng(11)
    q, n, L = 3, 10, 30
    rows = np.stack([_random_alignment(rng, n, L) for _ in range(q)])
    raws = np.stack(
        [S.create_matrix(rows[i], np.ones(n))[0] for i in range(q)]
    ).astype(np.float32)
    got, _, _ = SJ.calc_sift_scores_batch(rows.astype(np.int32), raws)
    for i in range(q):
        want, _, _ = S.calc_sift_scores(rows[i], raws[i].astype(np.float64))
        np.testing.assert_allclose(np.asarray(got[i]), want, rtol=2e-3, atol=2e-4)
