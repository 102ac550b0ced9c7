"""Substitution-matrix tests: all 8 reference-advertised names.

The reference CLI advertises BLOSUM_30/45/50/62/70/80/90/250
(reference main.cpp:306-314); every name must resolve to a valid scorer.
"""

import numpy as np
import pytest

from sift4g_tpu.constants import AA_FREQUENCY
from sift4g_tpu.core.scorers import MATRIX_NAMES, create_scorer

ADVERTISED = [
    "BLOSUM_30", "BLOSUM_45", "BLOSUM_50", "BLOSUM_62",
    "BLOSUM_70", "BLOSUM_80", "BLOSUM_90", "BLOSUM_250",
]


@pytest.mark.parametrize("name", ADVERTISED)
def test_all_advertised_names_accepted(name):
    s = create_scorer(name, 10, 1)
    assert s.matrix.shape == (26, 26)
    assert s.gap_open == 10 and s.gap_extend == 1


@pytest.mark.parametrize("name", ADVERTISED)
def test_matrix_structural_properties(name):
    m = create_scorer(name).matrix
    # symmetric scoring
    assert (m == m.T).all()
    # int8-representable (the Pallas kernels carry targets as int8 planes)
    assert np.abs(m).max() <= 127
    # positive diagonal on the 20 canonical amino acids
    canon = [ord(c) - 65 for c in "ARNDCQEGHILKMFPSTWYV"]
    assert (np.diag(m)[canon] > 0).all()
    # negative expected score under background frequencies (valid KA matrix)
    f = AA_FREQUENCY[canon]
    f = f / f.sum()
    sub = m[np.ix_(canon, canon)]
    assert float(f @ sub @ f) < 0


def test_blosum250_is_pam250():
    assert (create_scorer("BLOSUM_250").matrix
            == create_scorer("PAM_250").matrix).all()


def test_underscore_free_spellings():
    assert (create_scorer("BLOSUM62").matrix
            == create_scorer("BLOSUM_62").matrix).all()
    assert (create_scorer("PAM250").matrix
            == create_scorer("PAM_250").matrix).all()


def test_pam250_spot_values():
    # Canonical Dayhoff PAM250 entries (public NCBI table).
    m = create_scorer("PAM_250").matrix
    A = lambda c: ord(c) - 65
    for a, b, v in [("W", "W", 17), ("C", "C", 12), ("W", "R", 2),
                    ("F", "Y", 7), ("D", "E", 3)]:
        assert m[A(a), A(b)] == v


def test_unknown_matrix_rejected():
    with pytest.raises(ValueError):
        create_scorer("BLOSUM_100")


def test_bad_gaps_rejected():
    with pytest.raises(ValueError):
        create_scorer("BLOSUM_62", 1, 5)  # extend > open


def test_matrix_names_exported():
    for name in ("BLOSUM_30", "BLOSUM_70", "PAM_250"):
        assert name in MATRIX_NAMES
