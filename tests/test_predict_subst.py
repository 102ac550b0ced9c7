"""Subst-mode hybrid (device-f32 screen + sparse host-f64 exact) parity.

The hybrid's contract is BYTE-IDENTICAL .SIFTprediction output to the
float64 host oracle (predict.predict_prepared) — the fuzz here feeds both
paths the same prepared rows and compares files, with the f32 screen
coming from the real scores_jax math (CPU f32; the guarantee does not
depend on which f32 implementation produced the screen).
"""

import filecmp
import io
import os

import numpy as np
import pytest

from sift4g_tpu.core.chain import Chain
from sift4g_tpu.sift.predict import predict_prepared
from sift4g_tpu.sift.predict_subst import finish_subst_query, sparse_exact_scores
from sift4g_tpu.sift.scores import calc_sift_scores, create_matrix

STD20 = np.array([ord(c) - ord("A") for c in "ACDEFGHIKLMNPQRSTVWY"])


def _random_case(rng, conserved=False):
    L = int(rng.integers(12, 200))
    n = int(rng.integers(2, 60))
    q_codes = rng.choice(STD20, L).astype(np.uint8)
    if conserved:
        # near-identical homologs: scores pin to 1.0/low, medians drop
        rows = np.tile(q_codes, (n, 1))
        mut = rng.random(rows.shape) < 0.08
        rows[mut] = rng.choice(STD20, int(mut.sum()))
    else:
        rows = rng.choice(STD20, (n, L)).astype(np.uint8)
    # sprinkle X (masked) and the odd invalid letter
    xmask = rng.random(rows.shape) < 0.15
    rows[xmask] = ord("X") - ord("A")
    rows[0] = q_codes  # query as row 0 (prepare_rows contract)
    query = Chain.from_string(
        "Q", "".join(chr(c + ord("A")) for c in q_codes)
    )
    n_subst = int(rng.integers(1, 8))
    pos = rng.choice(L, size=min(n_subst, L), replace=False)
    lines = ["# comment", "bogus line"]
    for p in sorted(pos.tolist()):
        new_aa = chr(int(rng.choice(STD20)) + ord("A"))
        lines.append(f"{query.char(p)}{p + 1}{new_aa}  ")
    return query, rows, lines


def _f32_screen(rows):
    import jax.numpy as jnp

    from sift4g_tpu.sift.scores_jax import sift_scores_from_rows

    # pad to compile-shape buckets like predict_batch does (and to keep
    # this test to a handful of CPU jit compiles); padding is all-'X'
    # rows/cols, masked invalid, with n_valid carrying the real count
    n, L = rows.shape
    n_pad = -(-n // 64) * 64
    L_pad = -(-L // 128) * 128
    packed = np.full((n_pad, L_pad), ord("X") - ord("A"), dtype=rows.dtype)
    packed[:n, :L] = rows
    return np.asarray(
        sift_scores_from_rows(jnp.asarray(packed), n)
    )[:L]


def test_sparse_exact_matches_full_slices():
    """sparse_exact_scores == calc_sift_scores sliced, bitwise (the
    Dirichlet tree is per-position; docstring claim locked here)."""
    rng = np.random.default_rng(3)
    for trial in range(12):
        _, rows, _ = _random_case(rng, conserved=trial % 2 == 0)
        raw, _ = create_matrix(rows, np.ones(rows.shape[0]))
        full, _, _ = calc_sift_scores(rows, raw)
        k = min(rows.shape[1], int(rng.integers(1, 9)))
        positions = np.sort(rng.choice(rows.shape[1], k, replace=False))
        sparse = sparse_exact_scores(rows, raw, positions)
        assert np.array_equal(sparse, full[positions]), f"trial {trial}"


@pytest.mark.parametrize("conserved", [False, True])
def test_hybrid_byte_identical_to_oracle_fuzz(tmp_path, conserved):
    rng = np.random.default_rng(17 if conserved else 5)
    for trial in range(10):
        query, rows, lines = _random_case(rng, conserved)
        want = tmp_path / f"want_{conserved}_{trial}.SIFTprediction"
        got = tmp_path / f"got_{conserved}_{trial}.SIFTprediction"
        predict_prepared(query, rows, lines, str(want))
        finish_subst_query(
            query, rows, lines, _f32_screen(rows), str(got),
            log=io.StringIO(),
        )
        assert filecmp.cmp(want, got, shallow=False), (
            f"conserved={conserved} trial={trial}\n"
            f"want:\n{want.read_text()}\ngot:\n{got.read_text()}"
        )


def test_screen_drift_falls_back_to_oracle(tmp_path):
    """eps_screen=0 makes any nonzero f32 drift trip the in-run
    verification: the query must fall back to the float64 oracle and the
    output stays byte-identical."""
    rng = np.random.default_rng(29)
    query, rows, lines = _random_case(rng)
    want = tmp_path / "want.SIFTprediction"
    got = tmp_path / "got.SIFTprediction"
    predict_prepared(query, rows, lines, str(want))
    log = io.StringIO()
    finish_subst_query(
        query, rows, lines, _f32_screen(rows), str(got),
        eps_screen=0.0, log=log,
    )
    assert "falling back to the float64 oracle" in log.getvalue()
    assert filecmp.cmp(want, got, shallow=False)


def test_padded_screen_rows_ignored(tmp_path):
    """The device hands (L_pad, 26) scores; rows beyond the true query
    length must not affect output."""
    rng = np.random.default_rng(31)
    query, rows, lines = _random_case(rng)
    want = tmp_path / "want.SIFTprediction"
    got = tmp_path / "got.SIFTprediction"
    predict_prepared(query, rows, lines, str(want))
    screen = _f32_screen(rows)
    padded = np.vstack([screen, np.full((7, 26), 0.001, np.float32)])
    finish_subst_query(
        query, rows, lines, padded, str(got), log=io.StringIO()
    )
    assert filecmp.cmp(want, got, shallow=False)


def test_subst_process_pool_byte_identical(tmp_path, monkeypatch):
    """The finisher process pool (SIFT4G_TPU_SUBST_PROCS) produces
    byte-identical outputs to the inline path through the full pipeline."""
    import subprocess
    import sys

    TEST_FILES = "/root/reference/test_files"
    if not os.path.isdir(TEST_FILES):
        pytest.skip("reference test files not mounted")
    from sift4g_tpu.pipeline import PipelineConfig, run_pipeline

    outs = {}
    for procs in ("0", "2"):
        out = tmp_path / f"p{procs}"
        out.mkdir()
        monkeypatch.setenv("SIFT4G_TPU_SUBST_PROCS", procs)
        cfg = PipelineConfig(
            query_path=os.path.join(TEST_FILES, "query.fasta"),
            database_path=os.path.join(
                TEST_FILES, "sample_protein_database.fa"),
            subst_path=TEST_FILES,
            out_path=str(out),
            align_backend="numpy",
            predict_backend="device",
            log=io.StringIO(),
        )
        run_pipeline(cfg)
        outs[procs] = out
    for name in ("LACI_ECOLI", "PURR_SALTY"):
        assert filecmp.cmp(
            outs["0"] / f"{name}.SIFTprediction",
            outs["2"] / f"{name}.SIFTprediction",
            shallow=False,
        ), name
        # and against the committed goldens
        assert filecmp.cmp(
            outs["2"] / f"{name}.SIFTprediction",
            os.path.join(os.path.dirname(__file__), "golden",
                         f"{name}.SIFTprediction"),
            shallow=False,
        ), name


def test_hybrid_edge_cases_byte_identical(tmp_path):
    """Adversarial subst shapes: positions 1 and L, every substitution at
    one position, invalid letters (X/B/Z) in the QUERY itself, duplicate
    lines — all byte-identical to the oracle."""
    rng = np.random.default_rng(101)
    L, n = 40, 12
    q = list(rng.choice(STD20, L).astype(np.uint8))
    q[4] = ord("X") - ord("A")   # invalid letter inside the query
    q[5] = ord("B") - ord("A")
    q[6] = ord("Z") - ord("A")
    q_codes = np.asarray(q, dtype=np.uint8)
    rows = np.tile(q_codes, (n, 1))
    mut = rng.random(rows.shape) < 0.25
    rows[mut] = rng.choice(STD20, int(mut.sum()))
    rows[0] = q_codes
    query = Chain.from_string("Q", "".join(chr(c + ord("A")) for c in q_codes))

    aas = "ACDEFGHIKLMNPQRSTVWY"
    lines = [f"{query.char(0)}1{a}" for a in aas]          # all 20 at pos 1
    lines += [f"{query.char(L - 1)}{L}M"] * 3              # duplicates at L
    lines += [f"{query.char(4)}5K", f"{query.char(5)}6K", f"{query.char(6)}7K"]

    want = tmp_path / "want.out"
    got = tmp_path / "got.out"
    predict_prepared(query, rows, lines, str(want))
    finish_subst_query(
        query, rows, lines, _f32_screen(rows), str(got), log=io.StringIO()
    )
    assert filecmp.cmp(want, got, shallow=False), (
        f"want:\n{want.read_text()}\ngot:\n{got.read_text()}"
    )


def test_hybrid_single_row_and_tiny_query(tmp_path):
    """Degenerate shapes: the query alone (no surviving alignments rows
    beyond row 0) and an L=1 query."""
    for L, n in ((1, 1), (3, 1), (1, 4)):
        rng = np.random.default_rng(L * 10 + n)
        q_codes = rng.choice(STD20, L).astype(np.uint8)
        rows = np.tile(q_codes, (n, 1))
        query = Chain.from_string(
            "Q", "".join(chr(c + ord("A")) for c in q_codes)
        )
        lines = [f"{query.char(0)}1A"]
        want = tmp_path / f"want_{L}_{n}.out"
        got = tmp_path / f"got_{L}_{n}.out"
        predict_prepared(query, rows, lines, str(want))
        finish_subst_query(
            query, rows, lines, _f32_screen(rows), str(got),
            log=io.StringIO(),
        )
        assert filecmp.cmp(want, got, shallow=False), (L, n)
