"""E-value statistics tests."""

import io

import numpy as np
import pytest

from sift4g_tpu.core.evalue import (
    _GAPPED,
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


# Every (matrix, default-gap) pair: which take the published gapped table
# with sift4g's default open=10/extend=1 (== NCBI 9,1), and which fall back
# to computed ungapped stats because NCBI publishes no row for that combo.
_DEFAULT_GAP_EXPECT_GAPPED = {
    "BLOSUM_30": False,   # NCBI blast_stat.c has no BLOSUM30 gapped tables
    "BLOSUM_45": False,   # NCBI's supported BLOSUM45 range is open>=10 ext>=1 at (10..16,1..3); (9,1) unsupported
    "BLOSUM_50": False,   # NCBI BLOSUM50 range starts at (9,3)/(12,2)/(16,1)
    "BLOSUM_62": True,    # (9,1) is a published BLOSUM62 row
    "BLOSUM_70": False,   # no BLOSUM70 gapped tables in NCBI
    "BLOSUM_80": True,    # (9,1) is a published BLOSUM80 row
    "BLOSUM_90": True,    # (9,1) is a published BLOSUM90 row
    "BLOSUM_250": False,  # PAM250's published range starts at (11,3)/(13,2)/(17,1)
}


@pytest.mark.parametrize("name,expect_gapped",
                         sorted(_DEFAULT_GAP_EXPECT_GAPPED.items()))
def test_every_matrix_default_gap_pair(name, expect_gapped):
    scorer = create_scorer(name, 10, 1)
    log = io.StringIO()
    p = create_evalue_params(1_000_000, scorer, log=log)
    assert p.gapped == expect_gapped
    if expect_gapped:
        assert log.getvalue() == ""
        key = (scorer.name, 9, 1)
        assert p.lam == _GAPPED[key][0]
    else:
        # the fallback must be loud
        assert "WARNING" in log.getvalue()
        assert scorer.name in log.getvalue()
    # either way the params must produce finite, ordered E-values
    ev = evalues(np.array([60, 120]), 200, p)
    assert np.isfinite(ev).all() and ev[1] < ev[0]


@pytest.mark.parametrize("name", ["BLOSUM_50", "BLOSUM_90", "PAM_250"])
def test_new_gapped_rows_reachable(name):
    """The round-2 table rows actually engage at their NCBI gap costs."""
    # pick one (open, extend) per matrix, translated to sift4g convention
    # (scorer open = NCBI open + extend; see create_evalue_params key calc)
    ncbi = {"BLOSUM_50": (13, 3), "BLOSUM_90": (9, 1), "PAM_250": (14, 2)}[name]
    scorer = create_scorer(name, ncbi[0] + ncbi[1], ncbi[1])
    p = create_evalue_params(1_000_000, scorer)
    assert p.gapped
    assert p.lam == _GAPPED[(scorer.name, *ncbi)][0]


def test_evalue_scales_with_database_size():
    scorer = create_scorer("BLOSUM_62", 10, 1)
    small = create_evalue_params(1_000, scorer)
    large = create_evalue_params(1_000_000_000, scorer)
    e_small = evalues(np.array([100]), 300, small)[0]
    e_large = evalues(np.array([100]), 300, large)[0]
    assert e_large > e_small
