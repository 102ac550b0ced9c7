"""Prefilter semantics: k-mer packing, dedup, LIS, hash, candidate search."""

import numpy as np

from sift4g_tpu.core.chain import Chain
from sift4g_tpu.prefilter.kmer import (
    QueryKmerHash,
    dedup_adjacent,
    kmer_vector,
    lis_length,
)
from sift4g_tpu.prefilter.search import search_database


def codes(s: str) -> np.ndarray:
    return np.frombuffer(s.encode(), dtype=np.uint8) - ord("A")


def test_kmer_vector_packing():
    c = codes("ACDEF")
    kv = kmer_vector(c, 3)
    # rolling 5-bit packing: A=0, C=2, D=3, E=4, F=5
    assert kv.tolist() == [
        (0 << 10) | (2 << 5) | 3,
        (2 << 10) | (3 << 5) | 4,
        (3 << 10) | (4 << 5) | 5,
    ]
    assert kmer_vector(codes("AC"), 3).shape[0] == 0  # shorter than k


def test_kmer_vector_masks_to_k_letters():
    c = codes("WWWWWW")
    kv = kmer_vector(c, 5)
    w = ord("W") - ord("A")
    expected = 0
    for _ in range(5):
        expected = (expected << 5) | w
    assert all(v == expected for v in kv.tolist())


def test_dedup_adjacent_only():
    kv = np.array([5, 5, 3, 5, 5, 5, 2], dtype=np.uint32)
    assert dedup_adjacent(kv).tolist() == [5, 3, 5, 2]  # quirk Q5


def test_lis_strictly_increasing():
    assert lis_length(np.array([1, 2, 3])) == 3
    assert lis_length(np.array([3, 2, 1])) == 1
    assert lis_length(np.array([1, 1, 1])) == 1  # strict
    assert lis_length(np.array([2, 5, 3, 7, 11, 8, 10, 13, 6])) == 6
    assert lis_length(np.array([], dtype=np.int64)) == 0


def test_hash_lookup_order():
    qs = [codes("ACDACD"), codes("ACD")]
    h = QueryKmerHash(qs, 3)
    kv = kmer_vector(codes("ACD"), 3)
    qid, qpos = h.lookup(int(kv[0]))
    # query scan order, then position order within a query
    assert qid.tolist() == [0, 0, 1]
    assert qpos.tolist() == [0, 3, 1 - 1]


def test_search_database_finds_self(tmp_path):
    db = tmp_path / "db.fa"
    db.write_text(
        ">s0\nMKPVTLYDVAEYAGVSYQTVSRVVN\n"
        ">s1\nAAAAAAAAAAAAAAAAAAAAAAAAA\n"
        ">s2\nMKPVTLYDVAEYAGVSYQTVSRVVNQASHVSAKTREK\n"
    )
    q = Chain.from_string("q", "MKPVTLYDVAEYAGVSYQTVSRVVN")
    indices, cells = search_database(str(db), [q], kmer_length=5, max_candidates=10,
                                     log=open("/dev/null", "w"))
    assert cells == 25 + 25 + 37
    assert indices[0].tolist() == [0, 2]  # s1 shares no 5-mers


def test_search_top_k_truncation(tmp_path):
    # 5 identical targets, max_candidates=3: exactly 3 kept, ids ascending
    db = tmp_path / "db.fa"
    seq = "MKPVTLYDVAEYAGVSYQTVSRVVN"
    db.write_text("".join(f">s{i}\n{seq}\n" for i in range(5)))
    q = Chain.from_string("q", seq)
    indices, _ = search_database(str(db), [q], kmer_length=5, max_candidates=3,
                                 log=open("/dev/null", "w"))
    assert len(indices[0]) == 3
    assert indices[0].tolist() == sorted(indices[0].tolist())


def test_search_chunked_equals_single_chunk(tmp_path):
    rng = np.random.default_rng(3)
    letters = "ACDEFGHIKLMNPQRSTVWY"
    seqs = ["".join(rng.choice(list(letters), size=rng.integers(20, 80)))
            for _ in range(30)]
    db = tmp_path / "db.fa"
    db.write_text("".join(f">s{i}\n{s}\n" for i, s in enumerate(seqs)))
    q = Chain.from_string("q", seqs[7] + seqs[12])
    big, cells_big = search_database(str(db), [q], 4, 8, log=open("/dev/null", "w"))
    small, cells_small = search_database(str(db), [q], 4, 8, chunk_bytes=100,
                                         log=open("/dev/null", "w"))
    assert cells_big == cells_small
    assert big[0].tolist() == small[0].tolist()
