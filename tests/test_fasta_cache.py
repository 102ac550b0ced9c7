"""Binary FASTA parse cache == direct parsers (content + part boundaries)."""

import os

import numpy as np
import pytest

from sift4g_tpu.io.fasta import (
    CachedFastaStream,
    FastaStream,
    PyFastaStream,
    build_fasta_cache,
)


def _write(tmp_path, n=37, seed=2):
    rng = np.random.default_rng(seed)
    recs = []
    for i in range(n):
        seq = "".join(chr(ord("A") + c) for c in rng.integers(0, 26, rng.integers(3, 120)))
        recs.append(f">s{i} desc\n{seq}\n")
    p = tmp_path / "db.fa"
    p.write_text("".join(recs))
    return str(p)


def test_cache_matches_parser(tmp_path):
    path = _write(tmp_path)
    cp = build_fasta_cache(path)
    assert os.path.exists(cp)

    for budget in (1, 97, 5000, 1 << 40):
        ref_parts, got_parts = [], []
        with PyFastaStream(path) as fs:
            more = True
            while more:
                chains = []
                more = fs.read_part(chains, budget)
                ref_parts.append([(c.name, c.codes.tobytes()) for c in chains])
        with CachedFastaStream(cp) as fs:
            more = True
            while more:
                chains = []
                more = fs.read_part(chains, budget)
                got_parts.append([(c.name, c.codes.tobytes()) for c in chains])
        assert got_parts == ref_parts, f"budget={budget}"


def test_factory_prefers_cache_and_invalidates(tmp_path):
    path = _write(tmp_path)
    s = FastaStream(path)
    assert isinstance(s, CachedFastaStream)
    s.close()
    # stale cache (input newer) must be rebuilt
    cache = path + ".s4gc"
    old_mtime = os.path.getmtime(cache)
    os.utime(cache, (old_mtime - 10, old_mtime - 10))  # make cache look old
    stale_mtime = os.path.getmtime(cache)
    s2 = FastaStream(path)
    assert isinstance(s2, CachedFastaStream)
    assert os.path.getmtime(cache) > stale_mtime, "cache was not rebuilt"
    chains = []
    while s2.read_part(chains, 1 << 40):
        pass
    assert len(chains) == 37
