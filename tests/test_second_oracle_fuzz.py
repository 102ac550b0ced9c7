"""Fuzz: production vectorized SIFT math vs the scalar second oracle.

test_second_oracle.py validates the frozen goldens only; this fuzz runs
both implementations on RANDOM query-framed alignment-string sets (the
shapes alignmentsExtract produces, quirk Q6: valid letters or 'X') and
asserts the outputs agree at output precision — SIFT scores to 1e-9
(both are float64; they differ only in summation tree) and the selection
prefix / median-seq-info values exactly at their printed rounding.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))
import second_oracle as so

from sift4g_tpu.sift.scores import (
    add_median_seq_info,
    calc_sift_scores,
    create_matrix,
)
from sift4g_tpu.sift.select import alignments_select

AA20 = np.array([ord(c) - 65 for c in "ACDEFGHIKLMNPQRSTVWY"], dtype=np.uint8)
X = ord("X") - ord("A")


def _random_strings(rng, n_rows, L, x_heavy=False):
    """Random query-framed rows: query row 0 (valid letters), homolog rows
    with mutations and X runs (unaligned flanks / target-gap positions)."""
    q = AA20[rng.integers(0, 20, L)]
    rows = np.tile(q, (n_rows, 1))
    for r in range(n_rows):
        nmut = int(rng.integers(0, max(2, L // 3)))
        idx = rng.integers(0, L, nmut)
        rows[r, idx] = AA20[rng.integers(0, 20, nmut)]
        a = int(rng.integers(0, L // 2 if x_heavy else L // 5 + 1))
        b = int(rng.integers(0, L // 2 if x_heavy else L // 5 + 1))
        rows[r, :a] = X
        rows[r, L - b:] = X
        if x_heavy:  # interior target-gap X runs
            s = int(rng.integers(0, L))
            rows[r, s : s + int(rng.integers(0, L // 4))] = X
    return q, np.vstack([q[None, :], rows])


def _letters(row):
    return "".join(chr(65 + int(c)) for c in row)


@pytest.mark.parametrize("seed", [3, 17, 41, 99])
def test_sift_scores_match_scalar_oracle(seed):
    rng = np.random.default_rng(seed)
    L = int(rng.integers(12, 90))
    n = int(rng.integers(2, 40))
    q, rows = _random_strings(rng, n, L, x_heavy=(seed % 2 == 0))

    raw, aas_stored = create_matrix(rows, np.ones(rows.shape[0]))
    sift, _, _ = calc_sift_scores(rows, raw)

    strings = [_letters(r) for r in rows]
    raw_o, _ = so.create_matrix(strings, L, [1.0] * len(strings))
    sift_o = so.calc_sift_scores(strings, _letters(q), raw_o)

    np.testing.assert_allclose(sift, np.asarray(sift_o), atol=1e-9, rtol=1e-9)


@pytest.mark.parametrize("seed", [5, 23, 77])
def test_selection_matches_scalar_oracle(seed):
    rng = np.random.default_rng(seed)
    L = int(rng.integers(15, 80))
    n = int(rng.integers(3, 60))
    q, rows_with_q = _random_strings(rng, n, L)
    rows = rows_with_q[1:]  # selection sees DB rows only

    got = alignments_select(rows, 2.75)
    strings = [_letters(r) for r in rows]
    want = so.alignments_select(strings, _letters(q), 2.75)
    assert got == want


@pytest.mark.parametrize("seed", [7, 31])
def test_median_seq_info_matches_scalar_oracle(seed):
    rng = np.random.default_rng(seed)
    L = int(rng.integers(15, 60))
    n = int(rng.integers(3, 30))
    q, rows = _random_strings(rng, n, L, x_heavy=True)

    positions = sorted(set(int(p) for p in rng.integers(1, L + 1, 5)))
    mp = {str(p): -1.0 for p in positions}
    add_median_seq_info(rows, mp)

    strings = [_letters(r) for r in rows]
    mp_o = {str(p): -1.0 for p in positions}
    so.add_median_seq_info(strings, L, mp_o)

    for k in mp:
        # compare at the printed precision (2 decimals, printSubstFile)
        assert f"{mp[k]:.2f}" == f"{mp_o[k]:.2f}", (k, mp[k], mp_o[k])
        # and tightly: both are float64 pipelines
        assert abs(mp[k] - mp_o[k]) < 1e-6, (k, mp[k], mp_o[k])
