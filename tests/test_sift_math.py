"""SIFT math unit tests against hand-computed oracles."""

import math

import numpy as np

from sift4g_tpu.constants import LOG_2_20, get_median
from sift4g_tpu.sift.scores import (
    basic_matrix_construction,
    calc_diri,
    calc_epsilon,
    calc_seq_weights,
    calc_sift_scores,
    calculate_median_seq_info,
    create_matrix,
    find_max_aa,
    remove_seqs_identical_to_query,
)
from sift4g_tpu.sift.select import alignments_select


def codes(s: str) -> np.ndarray:
    return np.frombuffer(s.encode(), dtype=np.uint8) - ord("A")


def rows_of(*seqs):
    return np.stack([codes(s) for s in seqs])


def test_get_median_quirk_q1():
    # reference sorts only a[0..len-2]; the last element stays put
    a = np.array([5.0, 1.0, 4.0, 2.0, 0.0], dtype=np.float32)
    # sorted prefix [1,2,4,5], last stays 0 -> array [1,2,4,5,0], middle = 4
    assert get_median(a.copy(), 5) == np.float32(4.0)
    # a true median implementation would give 2.0
    b = np.array([3.0, 1.0, 2.0, 0.0], dtype=np.float32)
    # sorted prefix [1,2,3] + [0] -> [1,2,3,0], (a[1]+a[2])/2 = 2.5
    assert get_median(b.copy(), 4) == np.float32(2.5)


def test_create_matrix_counts_valid_only():
    rows = rows_of("AC", "AX", "AB")  # X and B are invalid amino acids
    m, tot = create_matrix(rows, np.ones(3))
    assert m[0, 0] == 3.0          # A at pos 0 three times
    assert m[1, 2] == 1.0          # C at pos 1 once
    assert m[1, 23] == 0.0         # X not counted
    assert m[1, 1] == 0.0          # B not counted
    assert tot.tolist() == [3.0, 1.0]


def test_seq_weights_henikoff():
    rows = rows_of("AA", "AC", "CC")
    raw, _ = create_matrix(rows, np.ones(3))
    w, ndiff = calc_seq_weights(rows, raw)
    assert ndiff.tolist() == [2.0, 2.0]
    # pos0: counts A=2, C=1 ; pos1: A=1, C=2
    # w0 = 1/(2*2) + 1/(2*1) = 0.75 ; w1 = 1/(2*2)+1/(2*2) = 0.5 ; w2 = 0.75
    raw_w = np.array([0.75, 0.5, 0.75])
    np.testing.assert_allclose(w, raw_w / raw_w.sum() * 3, rtol=1e-12)


def test_find_max_aa_first_wins():
    m = np.zeros((1, 26))
    m[0, 3] = 2.0
    m[0, 7] = 2.0
    assert find_max_aa(m)[0] == 3


def test_epsilon_single_aa_is_zero():
    rows = rows_of("A", "A")
    raw, _ = create_matrix(rows, np.ones(2))
    w, ndiff = calc_seq_weights(rows, raw)
    weighted, _ = create_matrix(rows, w)
    eps = calc_epsilon(weighted, find_max_aa(weighted), ndiff)
    assert eps[0] == 0.0


def test_epsilon_formula():
    rows = rows_of("A", "C")
    raw, _ = create_matrix(rows, np.ones(2))
    w, ndiff = calc_seq_weights(rows, raw)
    weighted, _ = create_matrix(rows, w)
    max_aa = find_max_aa(weighted)  # A (first max on tie)
    eps = calc_epsilon(weighted, max_aa, ndiff)
    from sift4g_tpu.constants import RANK_MATRIX

    wa, wc = weighted[0, 0], weighted[0, 2]
    expected = math.exp((RANK_MATRIX[0, 0] * wa + RANK_MATRIX[0, 2] * wc) / (wa + wc))
    assert abs(eps[0] - expected) < 1e-12


def test_diri_normalized_over_valid():
    rows = rows_of("AC", "AC", "AD")
    raw, _ = create_matrix(rows, np.ones(3))
    d = calc_diri(raw)
    sums = d.sum(axis=1)
    np.testing.assert_allclose(sums, 1.0, rtol=1e-12)
    # invalid letters get zero mass
    for bad in "BJOUXZ":
        assert (d[:, ord(bad) - ord("A")] == 0).all()


def test_sift_scores_max_is_one():
    rows = rows_of("ACD", "ACD", "AVD", "GCD")
    raw, _ = create_matrix(rows, np.ones(4))
    sift, _, _ = calc_sift_scores(rows, raw)
    np.testing.assert_allclose(sift.max(axis=1), 1.0, rtol=1e-12)


def test_identity_removal():
    q = codes("ACDEF")
    rows = rows_of("ACDEF", "ACDEX", "GGGGG")
    names = ["a", "b", "c"]
    kept_names, kept = remove_seqs_identical_to_query(q, names, rows, 100.0)
    # row0 = 100% identical -> dropped; row1 = 4/4 valid matches = 100% -> dropped
    assert kept_names == ["c"]
    kept_names, kept = remove_seqs_identical_to_query(q, names, rows, 101.0)
    assert kept_names == ["a", "b", "c"]


def test_alignments_select_growth():
    # identical rows: entropy 0 + log2_20 = 4.32 > 2.75 never drops for
    # a single repeated letter... entropy = 0 so pos_freq = 4.32 -> all
    # rows selected (quirk Q8: loop exhausts)
    rows = rows_of("AAAA", "AAAA", "AAAA")
    assert alignments_select(rows, 2.75) == 3
    # diverse rows at every position: entropy -> lower; with 26 distinct
    # letters per column the median drops below threshold quickly
    rng = np.random.default_rng(0)
    big = rng.integers(0, 20, size=(40, 50)).astype(np.uint8)
    n = alignments_select(big, 2.75)
    assert 1 <= n < 40


def test_alignments_select_threshold_boundary():
    rows = rows_of("AC", "CA")
    # threshold above the log2(20) initializer: the reference's loop
    # condition fails before the first prefix -> selects 0 (quirk)
    assert alignments_select(rows, 4.5) == 0
    # prefix 1 median is exactly log2(20) (single letter per column), so a
    # threshold below it always grows past 1; prefix 2 -> entropy -1 -> 3.32
    assert alignments_select(rows, 4.0) == 2
    assert alignments_select(rows, 3.5) == 2
    assert alignments_select(rows, 2.0) == 2  # exhausts


def test_basic_matrix_b_partitioning():
    rows = rows_of("B")
    m = basic_matrix_construction(rows, np.ones(1))
    iD, iN, iB = 3, 13, 1
    assert m[0, iD] > 0 and m[0, iN] > 0
    # column percentages sum to 100 over D,N
    assert abs(m[0, iD] + m[0, iN] - 100.0) < 1e-9
    # B row re-derived from scaled D/N
    from sift4g_tpu.constants import AA_FREQUENCY

    pD = AA_FREQUENCY[iD] / (AA_FREQUENCY[iD] + AA_FREQUENCY[iN])
    pN = AA_FREQUENCY[iN] / (AA_FREQUENCY[iD] + AA_FREQUENCY[iN])
    assert abs(m[0, iB] - (m[0, iD] * pD + m[0, iN] * pN)) < 1e-9


def test_median_seq_info_uniform():
    # single-letter column: information = log2(20) (max); uniform over the
    # 20 valid letters: information ~ log2(20) - log2(20) = 0
    m = np.zeros((2, 26))
    m[0, 0] = 100.0
    from sift4g_tpu.constants import VALID_AA_MASK

    m[1, VALID_AA_MASK] = 5.0
    med = calculate_median_seq_info(m)
    lo = LOG_2_20 + math.log(5.0 / 100.0)  # not meaningful; just check range
    assert 0.0 <= med <= LOG_2_20 + 1e-6


def test_native_select_parity_fuzz():
    """native/select.cpp == the numpy blocked path == (via the existing
    fuzz suite) the scalar second oracle, across mutation/X densities and
    thresholds including the kLog_2_20 boundary."""
    import sift4g_tpu.sift.select as S
    from sift4g_tpu.sift.select import alignments_select

    rng = np.random.default_rng(77)
    for trial in range(120):
        n = int(rng.integers(1, 50))
        L = int(rng.integers(1, 100))
        base = rng.integers(0, 26, L).astype(np.uint8)
        rows = np.tile(base, (n, 1))
        mut = rng.random((n, L)) < rng.random() * 0.8
        rows[mut] = rng.integers(0, 26, mut.sum())
        xm = rng.random((n, L)) < rng.random() * 0.5
        rows[xm] = 23
        thr = float(rng.choice([2.75, 1.0, 3.5, 4.0, 4.33, 4.321928095]))
        got = alignments_select(rows, thr)
        orig = S._native_select
        S._native_select = lambda *a, **k: None
        try:
            want = alignments_select(rows, thr)
        finally:
            S._native_select = orig
        assert got == want, (trial, got, want, n, L, thr)
