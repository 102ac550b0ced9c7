"""Randomized mini-database pipeline fuzz: all host backends byte-agree.

Catches cross-component divergence (prefilter candidate sets, E-value
filtering, selection, prediction formatting) that unit tests can miss.
"""

import filecmp
import os

import numpy as np
import pytest

from sift4g_tpu.pipeline import PipelineConfig, run_pipeline

STD = np.array([ord(c) - ord("A") for c in "ACDEFGHIKLMNPQRSTVWY"])


def _write_fasta(path, names, seqs):
    with open(path, "w") as fh:
        for name, codes in zip(names, seqs):
            s = "".join(chr(c + ord("A")) for c in codes)
            fh.write(f">{name}\n{s}\n")


@pytest.mark.parametrize("seed", [1, 7])
def test_backends_byte_agree_on_random_db(tmp_path, seed):
    rng = np.random.default_rng(seed)
    n_q, n_db = 3, 60
    q_seqs = [rng.choice(STD, size=int(rng.integers(40, 160))) for _ in range(n_q)]
    db = []
    for i in range(n_db):
        if i < 12:  # mutated homologs so alignments exist
            src = q_seqs[i % n_q].copy()
            mask = rng.random(src.shape[0]) < 0.3
            src[mask] = rng.choice(STD, size=int(mask.sum()))
            db.append(src)
        else:
            db.append(rng.choice(STD, size=int(rng.integers(30, 300))))
    qp = tmp_path / "q.fa"
    dp = tmp_path / "db.fa"
    _write_fasta(qp, [f"Q{i}" for i in range(n_q)], q_seqs)
    _write_fasta(dp, [f"T{i}" for i in range(n_db)], db)

    outs = {}
    for backend in ("numpy", "native", "xla"):
        out = tmp_path / backend
        out.mkdir()
        cfg = PipelineConfig(
            query_path=str(qp),
            database_path=str(dp),
            out_path=str(out),
            align_backend=backend,
            max_candidates=40,
            log=open(os.devnull, "w"),
        )
        run_pipeline(cfg)
        outs[backend] = sorted(os.listdir(out))

    assert outs["numpy"] == outs["native"] == outs["xla"]
    for fname in outs["numpy"]:
        a = tmp_path / "numpy" / fname
        for backend in ("native", "xla"):
            b = tmp_path / backend / fname
            assert filecmp.cmp(a, b, shallow=False), (fname, backend)
