"""IO tests: FASTA streaming, subst validation, writer formats."""

import numpy as np

from sift4g_tpu.core.chain import Chain, ChainBatch
from sift4g_tpu.io.fasta import FastaStream, read_fasta
from sift4g_tpu.io.subst import check_data, parse_subst_line
from sift4g_tpu.io.writers import write_matrix_original_format


def test_read_fasta_names_and_filtering(tmp_path):
    p = tmp_path / "a.fa"
    p.write_text(">seq1 description here\nACD efg\n*-X\n>seq2\n\nKLM\nNP\n")
    chains = read_fasta(str(p))
    assert [c.name for c in chains] == ["seq1", "seq2"]
    assert chains[0].letters == "ACDEFGX"  # lowercase upcased, non-alpha dropped
    assert chains[1].letters == "KLMNP"


def test_fasta_stream_chunking(tmp_path):
    p = tmp_path / "a.fa"
    p.write_text("".join(f">s{i}\n{'A' * 50}\n" for i in range(10)))
    chains = []
    with FastaStream(str(p)) as fs:
        assert fs.read_part(chains, 120) is True
        first = len(chains)
        assert first < 10
        while fs.read_part(chains, 120):
            pass
    assert len(chains) == 10
    assert [c.name for c in chains] == [f"s{i}" for i in range(10)]


def test_parse_subst_line():
    assert parse_subst_line("K2S") == ("K", 2, "S")
    assert parse_subst_line("K2S  # trailing comment") == ("K", 2, "S")
    assert parse_subst_line("# comment") is None
    assert parse_subst_line("") is None
    assert parse_subst_line("12K") is None


def test_check_data_drops_invalid(tmp_path):
    q1 = Chain.from_string("good", "ACDEF")
    q2 = Chain.from_string("badref", "ACDEF")
    q3 = Chain.from_string("oob", "ACDEF")
    q4 = Chain.from_string("nofile", "ACDEF")
    q5 = Chain.from_string("empty", "ACDEF")
    (tmp_path / "good.subst").write_text("A1C\n# note\n")
    (tmp_path / "badref.subst").write_text("C1A\n")
    (tmp_path / "oob.subst").write_text("A9C\n")
    (tmp_path / "empty.subst").write_text("# nothing valid\n")
    kept = check_data([q1, q2, q3, q4, q5], str(tmp_path), log=open("/dev/null", "w"))
    assert [c.name for c in kept] == ["good", "nofile"]


def test_matrix_writer_format(tmp_path):
    m = np.zeros((2, 26))
    m[:, 0] = 1.0
    out = tmp_path / "m.SIFTprediction"
    write_matrix_original_format(m, str(out))
    lines = out.read_text().splitlines()
    assert lines[0] == "ID   UNK_ID; MATRIX"
    assert lines[4].split() == list("ABCDEFGHIKLMNPQRSTVWXYZ") + ["*", "-"]
    # 23 amino acid columns + * and - zeros
    row = lines[5].split()
    assert len(row) == 25
    assert row[0] == "1.0000" and row[1] == "0.0000"
    assert lines[-1] == "//"


def test_chain_batch_padding():
    chains = [Chain.from_string("a", "ACD"), Chain.from_string("b", "A" * 200)]
    b = ChainBatch.from_chains(chains)
    assert b.codes.shape == (2, 256)
    assert b.lengths.tolist() == [3, 200]
    assert (b.codes[0, 3:] == 31).all()


def test_atomic_output_no_partial_final_file(tmp_path):
    """atomic_output: success replaces atomically; a failure mid-write
    leaves NO file under the final name and no stray temp."""
    import os

    from sift4g_tpu.io.writers import atomic_output

    p = tmp_path / "out.txt"
    with atomic_output(str(p)) as fp:
        fp.write("complete\n")
    assert p.read_text() == "complete\n"

    # overwrite attempt that dies mid-write must keep the old content
    try:
        with atomic_output(str(p)) as fp:
            fp.write("partial")
            raise RuntimeError("simulated crash")
    except RuntimeError:
        pass
    assert p.read_text() == "complete\n"
    assert os.listdir(tmp_path) == ["out.txt"]
