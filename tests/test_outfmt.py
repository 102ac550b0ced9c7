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
    else:  # bm0 pairwise blocks
        assert any(l.startswith(">") for l in lines)
        assert any(l.strip().startswith("Q:") for l in lines)
        assert any(l.strip().startswith("T:") for l in lines)
