"""Robustness: degenerate inputs must not crash or corrupt output."""

import os

import numpy as np
import pytest

from sift4g_tpu.pipeline import PipelineConfig, run_pipeline


def _cfg(tmp_path, **kw):
    return PipelineConfig(
        out_path=str(tmp_path),
        align_backend="numpy",
        log=open(os.devnull, "w"),
        **kw,
    )


def test_empty_database(tmp_path):
    q = tmp_path / "q.fa"
    q.write_text(">Q1\nMKVLITTTT\n")
    d = tmp_path / "d.fa"
    d.write_text("")
    run_pipeline(_cfg(tmp_path, query_path=str(q), database_path=str(d)))
    # no candidates -> no prediction file, but no crash
    assert not (tmp_path / "Q1.SIFTprediction").exists()


def test_query_without_hits(tmp_path):
    q = tmp_path / "q.fa"
    q.write_text(">Q1\n" + "W" * 50 + "\n")
    d = tmp_path / "d.fa"
    d.write_text(">T1\n" + "A" * 200 + "\n>T2\n" + "C" * 100 + "\n")
    run_pipeline(_cfg(tmp_path, query_path=str(q), database_path=str(d)))
    assert not (tmp_path / "Q1.SIFTprediction").exists()


def test_malformed_fasta_lines_ignored(tmp_path):
    seq = "MKVLITGAHE" * 6  # long enough that the self-match passes E-value
    q = tmp_path / "q.fa"
    q.write_text(
        "garbage before header\n>Q1 desc\n"
        + seq[:30].lower()
        + " \n123\n"
        + seq[30:]
        + "\n"
    )
    d = tmp_path / "d.fa"
    d.write_text(f">T1\n{seq}\n>T2\n{'A' * 80}\n")
    run_pipeline(_cfg(tmp_path, query_path=str(q), database_path=str(d),
                      sequence_identity=101))
    out = tmp_path / "Q1.SIFTprediction"
    assert out.exists()  # noise lines dropped; query == T1 modulo case/digits


def test_short_sequences_below_kmer_length(tmp_path):
    q = tmp_path / "q.fa"
    q.write_text(">Q1\nMK\n")      # shorter than k=5: no k-mers
    d = tmp_path / "d.fa"
    d.write_text(">T1\nMK\n>T2\nMKVLITTTT\n")
    run_pipeline(_cfg(tmp_path, query_path=str(q), database_path=str(d)))
    assert not (tmp_path / "Q1.SIFTprediction").exists()


def test_duplicate_query_names_both_processed(tmp_path):
    q = tmp_path / "q.fa"
    q.write_text(">Q1\nMKVLITTTTAAAA\n>Q1\nMKVLITTTTCCCC\n")
    d = tmp_path / "d.fa"
    d.write_text(">T1\nMKVLITTTTAAAA\n>T2\nMKVLITTTTCCCC\n")
    run_pipeline(_cfg(tmp_path, query_path=str(q), database_path=str(d)))
    assert (tmp_path / "Q1.SIFTprediction").exists()
