"""E-value statistics tests."""

import numpy as np

from sift4g_tpu.core.evalue import (
    create_evalue_params,
    evalues,
    length_adjustment,
)
from sift4g_tpu.core.scorers import create_scorer


def test_default_params_are_gapped_table():
    scorer = create_scorer("BLOSUM_62", 10, 1)  # == NCBI (9, 1)
    p = create_evalue_params(10_000_000, scorer)
    assert p.gapped
    assert abs(p.lam - 0.206) < 1e-9
    assert abs(p.K - 0.010) < 1e-9


def test_ungapped_fallback_is_consistent():
    # an exotic gap setting falls back to computed ungapped params
    scorer = create_scorer("BLOSUM_62", 30, 5)
    p = create_evalue_params(1_000_000, scorer)
    assert not p.gapped
    # published ungapped BLOSUM62 values: lambda ~0.3176, K ~0.134, H ~0.40
    assert abs(p.lam - 0.3176) < 0.01
    assert abs(p.K - 0.134) < 0.03
    assert abs(p.H - 0.40) < 0.05


def test_evalue_monotonic_in_score():
    scorer = create_scorer("BLOSUM_62", 10, 1)
    p = create_evalue_params(10_000_000, scorer)
    ev = evalues(np.array([50, 100, 200, 400]), 300, p)
    assert (np.diff(ev) < 0).all()
    assert ev[-1] < 1e-4 < ev[0]


def test_length_adjustment_reasonable():
    scorer = create_scorer("BLOSUM_62", 10, 1)
    p = create_evalue_params(10_000_000, scorer)
    ell = length_adjustment(p, 300)
    assert 0 <= ell <= 150  # clamps at half the query for marginal (9,1) stats


def test_evalue_scales_with_database_size():
    scorer = create_scorer("BLOSUM_62", 10, 1)
    small = create_evalue_params(1_000, scorer)
    large = create_evalue_params(1_000_000_000, scorer)
    e_small = evalues(np.array([100]), 300, small)[0]
    e_large = evalues(np.array([100]), 300, large)[0]
    assert e_large > e_small
