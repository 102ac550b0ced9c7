"""All four alignment-report formats produce well-formed output e2e."""

import os

import pytest

from sift4g_tpu.pipeline import PipelineConfig, run_pipeline

TEST_FILES = "/root/reference/test_files"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(TEST_FILES), reason="reference test files not mounted"
)


@pytest.mark.parametrize("fmt", ["bm0", "bm8", "bm9", "light"])
def test_outfmt_reports(tmp_path, fmt):
    cfg = PipelineConfig(
        query_path=os.path.join(TEST_FILES, "query.fasta"),
        database_path=os.path.join(TEST_FILES, "sample_protein_database.fa"),
        out_path=str(tmp_path),
        align_backend="numpy",
        sub_results=True,
        out_format=fmt,
        log=open(os.devnull, "w"),
    )
    run_pipeline(cfg)
    text = (tmp_path / "alignments.txt").read_text()
    assert text, fmt
    lines = [l for l in text.splitlines() if l and not l.startswith("#")]
    if fmt == "light":
        assert all(len(l.split("\t")) == 2 for l in lines)
        assert all(l.split("\t")[0].lstrip("-").isdigit() for l in lines)
    elif fmt in ("bm8", "bm9"):
        assert all(len(l.split("\t")) == 12 for l in lines)
        if fmt == "bm9":
            assert "# Fields:" in text
        else:
            assert "#" not in text
    else:  # bm0: BLAST m0 pairwise stanzas
        assert any(l.startswith("Query= ") for l in lines)
        assert any(l.startswith(">") for l in lines)
        assert any(l.startswith(" Score = ") and ",  Expect = " in l for l in lines)
        assert any(l.startswith(" Identities = ") and "Positives = " in l
                   and "Gaps = " in l for l in lines)
        assert any(l.startswith("Query  ") for l in lines)
        assert any(l.startswith("Sbjct  ") for l in lines)


def test_bm0_block_rendering():
    """Lock the BLAST m0 stanza byte format on a hand-built alignment:
    midline letter/+/space convention, gap-aware 1-based coordinates,
    60-column blocks, Identities/Positives/Gaps accounting."""
    import io

    import numpy as np

    from sift4g_tpu.align.records import (
        MOVE_DIAG,
        MOVE_LEFT,
        MOVE_UP,
        AlignmentRecord,
    )
    from sift4g_tpu.core.chain import Chain
    from sift4g_tpu.core.scorers import create_scorer
    from sift4g_tpu.io.writers import _write_blast_m0

    scorer = create_scorer("BLOSUM_62")
    # query  AR-DC  (gap at target's N: Leu inserted)
    # target AKLDC  : A=A ident; R/K positive (BLOSUM62 R,K=+2); gap; D,C ident
    q = Chain.from_string("q", "ARDC")
    t = Chain.from_string("t", "AKLDC")
    rec = AlignmentRecord(
        score=17, query_start=0, query_end=3, target_start=0, target_end=4,
        moves=np.array([MOVE_DIAG, MOVE_DIAG, MOVE_LEFT, MOVE_DIAG, MOVE_DIAG],
                       dtype=np.uint8),
        target_idx=0, target_name="t", evalue=1.5e-8,
        query_codes=q.codes, target_codes=t.codes,
    )
    buf = io.StringIO()
    _write_blast_m0(buf, q, rec, scorer.matrix)
    assert buf.getvalue() == (
        ">t\n"
        "Length=5\n"
        "\n"
        " Score = 17,  Expect = 1.5e-08\n"
        " Identities = 3/5 (60%), Positives = 4/5 (80%), Gaps = 1/5 (20%)\n"
        "\n"
        "Query  1  AR-DC  4\n"
        "          A+ DC\n"
        "Sbjct  1  AKLDC  5\n"
        "\n"
        "\n"
    )
