"""Native C++ engines == pure-Python fallbacks (FASTA parsing, prefilter)."""

import os

import numpy as np
import pytest

from sift4g_tpu import native
from sift4g_tpu.core.chain import Chain

lib = native.load()
pytestmark = pytest.mark.skipif(lib is None, reason="native library not built")

TRICKY_FASTA = (
    ">seq1 description with tokens\n"
    "ACDEFGhiklm\n"
    "NPQRS\r\n"
    "\n"
    ">seq2\n"
    "tvwy*xz-AC\n"
    ">empty_seq\n"
    ">seq4\nMKV"  # no trailing newline
)


def _write(tmp_path, text):
    p = tmp_path / "db.fa"
    p.write_text(text)
    return str(p)


def test_fasta_native_matches_python(tmp_path):
    from sift4g_tpu.io.fasta import NativeFastaStream, PyFastaStream

    path = _write(tmp_path, TRICKY_FASTA)
    py_chains, na_chains = [], []
    with PyFastaStream(path) as fs:
        while fs.read_part(py_chains, 1 << 40):
            pass
    with NativeFastaStream(path, lib=lib) as fs:
        while fs.read_part(na_chains, 1 << 40):
            pass
    assert [c.name for c in na_chains] == [c.name for c in py_chains]
    for a, b in zip(na_chains, py_chains):
        np.testing.assert_array_equal(a.codes, b.codes)


def test_fasta_native_part_boundaries(tmp_path):
    """Small residue budgets must split parts exactly like the Python reader."""
    from sift4g_tpu.io.fasta import NativeFastaStream, PyFastaStream

    rng = np.random.default_rng(5)
    recs = []
    for i in range(23):
        seq = "".join(chr(ord("A") + c) for c in rng.integers(0, 26, rng.integers(3, 90)))
        recs.append(f">s{i} x\n{seq}\n")
    path = _write(tmp_path, "".join(recs))

    for budget in (1, 50, 200, 10_000):
        py_parts, na_parts = [], []
        with PyFastaStream(path) as fs:
            more = True
            while more:
                chains = []
                more = fs.read_part(chains, budget)
                py_parts.append([c.name for c in chains])
        with NativeFastaStream(path, lib=lib) as fs:
            more = True
            while more:
                chains = []
                more = fs.read_part(chains, budget)
                na_parts.append([c.name for c in chains])
        assert na_parts == py_parts, f"budget={budget}"


def test_native_search_matches_numpy(tmp_path):
    from sift4g_tpu.prefilter import search as S

    rng = np.random.default_rng(17)
    n_db, n_q = 300, 5
    recs = []
    for i in range(n_db):
        seq = "".join(chr(ord("A") + c) for c in rng.integers(0, 20, rng.integers(20, 400)))
        recs.append(f">t{i}\n{seq}\n")
    path = _write(tmp_path, "".join(recs))
    queries = []
    for i in range(n_q):
        codes = rng.integers(0, 20, rng.integers(50, 200)).astype(np.uint8)
        queries.append(Chain(name=f"q{i}", codes=codes))

    devnull = open(os.devnull, "w")
    for kmer in (3, 4, 5):
        for max_cand, chunk in ((25, 1 << 40), (25, 4000), (5000, 4000)):
            got_idx, got_cells = S._search_database_native(
                lib, path, queries, kmer, max_cand, chunk, devnull
            )
            os.environ["SIFT4G_TPU_NO_NATIVE"] = "1"
            try:
                want_idx, want_cells = S.search_database(
                    path, queries, kmer, max_cand, chunk, log=devnull
                )
            finally:
                del os.environ["SIFT4G_TPU_NO_NATIVE"]
            assert got_cells == want_cells
            for a, b in zip(got_idx, want_idx):
                np.testing.assert_array_equal(a, b)
    devnull.close(), (kmer, max_cand, chunk)


def test_native_search_thread_count_independent(tmp_path):
    """Candidate sets must not depend on the thread count (merge rule)."""
    from sift4g_tpu.prefilter.kmer import QueryKmerHash
    import ctypes

    rng = np.random.default_rng(41)
    recs = []
    for i in range(400):
        seq = "".join(chr(ord("A") + c) for c in rng.integers(0, 20, rng.integers(30, 200)))
        recs.append(f">t{i}\n{seq}\n")
    path = tmp_path / "db.fa"
    path.write_text("".join(recs))
    queries = [
        Chain(name=f"q{i}", codes=rng.integers(0, 20, 120).astype(np.uint8))
        for i in range(4)
    ]
    from sift4g_tpu.prefilter import search as S
    import os as _os

    devnull = open(_os.devnull, "w")
    results = []
    for n_threads in (1, 8):
        qhash = QueryKmerHash([q.codes for q in queries], 5)
        i64p = ctypes.POINTER(ctypes.c_int64)
        i32p = ctypes.POINTER(ctypes.c_int32)
        starts = np.ascontiguousarray(qhash.starts)
        hq = np.ascontiguousarray(qhash.hit_query)
        hp = np.ascontiguousarray(qhash.hit_pos)
        ctx = lib.sift4g_search_create(
            len(queries), 30, 5, starts.ctypes.data_as(i32p), starts.shape[0],
            hq.ctypes.data_as(i32p), hp.ctypes.data_as(i32p), hq.shape[0], n_threads,
        )
        try:
            from sift4g_tpu.io.fasta import NativeFastaStream

            with NativeFastaStream(str(path), lib=lib) as fs:
                more = True
                consumed = 0
                while more:
                    more, codes, offsets, _ = fs.read_part_arrays(3000)
                    n_seq = offsets.shape[0] - 1
                    if n_seq:
                        lib.sift4g_search_chunk(
                            ctx, codes.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                            offsets.ctypes.data_as(i64p), n_seq, consumed,
                        )
                        consumed += n_seq
            counts = np.empty(len(queries), dtype=np.int64)
            lib.sift4g_search_counts(ctx, counts.ctypes.data_as(i64p))
            flat = np.empty(max(int(counts.sum()), 1), dtype=np.int64)
            lib.sift4g_search_collect(ctx, flat.ctypes.data_as(i64p))
            results.append((counts.copy(), flat.copy()))
        finally:
            lib.sift4g_search_destroy(ctx)
    np.testing.assert_array_equal(results[0][0], results[1][0])
    np.testing.assert_array_equal(results[0][1], results[1][1])


def test_native_search_truncation_tie_parity(tmp_path):
    """Stress the mid-chunk local truncation + floor raise (search.cpp):
    fixed-length low-alphabet targets produce heavy score ties, small
    max_candidates forces repeated 2x-maxc truncations, and candidates
    arriving later with score == floor must be rejected exactly as the
    NumPy oracle's total order (score desc, id asc) dictates."""
    from sift4g_tpu.prefilter import search as S

    rng = np.random.default_rng(99)
    recs = []
    for i in range(400):
        seq = "".join(chr(ord("A") + c) for c in rng.integers(0, 4, 40))
        recs.append(f">t{i}\n{seq}\n")
    path = _write(tmp_path, "".join(recs))
    queries = [
        Chain(name=f"q{i}", codes=rng.integers(0, 4, 60).astype(np.uint8))
        for i in range(3)
    ]
    devnull = open(os.devnull, "w")
    for max_cand in (4, 16):
        for chunk in (1 << 40, 2000):
            got_idx, _ = S._search_database_native(
                lib, path, queries, 3, max_cand, chunk, devnull
            )
            os.environ["SIFT4G_TPU_NO_NATIVE"] = "1"
            try:
                want_idx, _ = S.search_database(
                    path, queries, 3, max_cand, chunk, log=devnull
                )
            finally:
                del os.environ["SIFT4G_TPU_NO_NATIVE"]
            for a, b in zip(got_idx, want_idx):
                np.testing.assert_array_equal(a, b)


def test_native_search_tie_stress(tmp_path):
    """Admission-floor exactness on a tie-heavy database: many equal-length
    sequences sharing k-mers produce identical LIS/len scores, so the
    global-floor gate and the nth_element truncation operate right at the
    (score desc, id asc) tie boundary.  Candidate sets must still equal the
    NumPy reference exactly, at every chunking."""
    from sift4g_tpu.prefilter import search as S

    rng = np.random.default_rng(99)
    base = rng.integers(0, 20, 60)
    recs = []
    for i in range(500):
        seq = base.copy()
        # a couple of point mutations: most sequences keep identical k-mer
        # hit structure -> equal scores (len is constant)
        for _ in range(int(rng.integers(0, 3))):
            seq[rng.integers(0, 60)] = rng.integers(0, 20)
        recs.append(">t%d\n%s\n" % (i, "".join(chr(ord("A") + c) for c in seq)))
    path = _write(tmp_path, "".join(recs))
    queries = [
        Chain(name="q0", codes=base.astype(np.uint8)),
        Chain(name="q1", codes=rng.integers(0, 20, 80).astype(np.uint8)),
    ]
    devnull = open(os.devnull, "w")  # noqa: SIM115 — closed below
    for max_cand in (7, 64, 300):
        for chunk in (1 << 40, 2000, 700):
            got_idx, got_cells = S._search_database_native(
                native.load(), path, queries, 5, max_cand, chunk, devnull
            )
            os.environ["SIFT4G_TPU_NO_NATIVE"] = "1"
            try:
                want_idx, want_cells = S.search_database(
                    path, queries, 5, max_cand, chunk, log=devnull
                )
            finally:
                del os.environ["SIFT4G_TPU_NO_NATIVE"]
            assert got_cells == want_cells
            for a, b in zip(got_idx, want_idx):
                np.testing.assert_array_equal(a, b)
    devnull.close()


def test_native_search_flat_gather_matches(tmp_path, monkeypatch):
    """The large-query-count flat gather layout (hit-key sort) must produce
    the same candidate sets as the per-query-table layout."""
    from sift4g_tpu.prefilter import search as S

    rng = np.random.default_rng(23)
    recs = []
    for i in range(300):
        seq = "".join(chr(ord("A") + c) for c in rng.integers(0, 20, rng.integers(20, 300)))
        recs.append(f">t{i}\n{seq}\n")
    path = _write(tmp_path, "".join(recs))
    queries = [
        Chain(name=f"q{i}", codes=rng.integers(0, 20, rng.integers(40, 150)).astype(np.uint8))
        for i in range(6)
    ]
    devnull = open(os.devnull, "w")
    results = []
    for thresh in ("0", "8192"):  # 0 forces flat, default forces tables
        monkeypatch.setenv("SIFT4G_TPU_FLAT_THRESHOLD", thresh)
        got_idx, got_cells = S._search_database_native(
            native.load(), path, queries, 5, 25, 4000, devnull
        )
        results.append((got_idx, got_cells))
    devnull.close()
    assert results[0][1] == results[1][1]
    for a, b in zip(results[0][0], results[1][0]):
        np.testing.assert_array_equal(a, b)


def test_native_hash_matches_numpy(monkeypatch):
    """The C++ CSR hash build must produce bit-identical arrays to the
    NumPy path (same fill order: query scan order, then position)."""
    from sift4g_tpu.prefilter.kmer import QueryKmerHash

    rng = np.random.default_rng(31)
    for k in (3, 4, 5):
        codes = [rng.integers(0, 26, int(n)).astype(np.uint8)
                 for n in rng.integers(1, 300, 12)]
        native_h = QueryKmerHash(codes, k)
        monkeypatch.setenv("SIFT4G_TPU_NO_NATIVE", "1")
        # reset the cached lib state so load() re-checks the env
        import sift4g_tpu.native as N
        numpy_h = QueryKmerHash(codes, k)
        monkeypatch.delenv("SIFT4G_TPU_NO_NATIVE")
        np.testing.assert_array_equal(native_h.starts, numpy_h.starts)
        np.testing.assert_array_equal(native_h.hit_query, numpy_h.hit_query)
        np.testing.assert_array_equal(native_h.hit_pos, numpy_h.hit_pos)


def test_native_search_zero_max_candidates(tmp_path):
    """max_candidates <= 0 is the degenerate admit-nothing case: the gate
    pre-arms at the 1e6 floor so the admission path (and its maxc-sized
    nth_element) is never reached (search.cpp sift4g_search_create).  The
    CLI rejects the value; this guards direct library callers."""
    from sift4g_tpu.prefilter import search as S

    rng = np.random.default_rng(3)
    recs = []
    for i in range(50):
        seq = "".join(chr(ord("A") + c) for c in rng.integers(0, 20, 120))
        recs.append(f">t{i}\n{seq}\n")
    path = _write(tmp_path, "".join(recs))
    queries = [Chain(name="q0", codes=rng.integers(0, 20, 80).astype(np.uint8))]

    devnull = open(os.devnull, "w")
    idx, cells = S._search_database_native(lib, path, queries, 5, 0, 1 << 40, devnull)
    devnull.close()
    assert cells == 50 * 120
    assert all(len(a) == 0 for a in idx)


def _random_extract_case(rng, n_recs=40, L=120):
    """Random well-formed (query, records) for extraction parity."""
    from sift4g_tpu.align.records import (
        MOVE_DIAG, MOVE_LEFT, MOVE_UP, AlignmentRecord,
    )
    from sift4g_tpu.core.chain import Chain

    q = Chain.from_string(
        "Q", "".join(chr(ord("A") + c) for c in rng.integers(0, 26, L))
    )
    records = []
    for r in range(n_recs):
        tn = int(rng.integers(10, 200))
        tcodes = rng.integers(0, 26, tn).astype(np.uint8)
        q0 = int(rng.integers(0, L))
        t0 = int(rng.integers(0, tn))
        # random walk of moves bounded by both cursors
        moves, qi, ti = [], q0, t0
        while qi < L and ti < tn and len(moves) < 300:
            m = int(rng.choice([MOVE_DIAG, MOVE_DIAG, MOVE_LEFT, MOVE_UP]))
            if m != MOVE_LEFT:
                qi += 1
            if m != MOVE_UP:
                ti += 1
            moves.append(m)
        records.append(AlignmentRecord(
            score=0, query_start=q0, query_end=qi - 1,
            target_start=t0, target_end=ti - 1,
            moves=np.asarray(moves, dtype=np.uint8),
            target_name=f"t{r}", target_codes=tcodes,
        ))
    return q, records


def test_native_extract_parity_fuzz():
    """sift4g_extract(_checked) vs the vectorized numpy replay vs a scalar
    replay: identical rows on random move streams (advisor r4: the two
    production paths had no direct parity test)."""
    from sift4g_tpu import native
    from sift4g_tpu.sift.select import extract_alignment_strings

    if native.load() is None:
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(11)
    for trial in range(8):
        q, records = _random_extract_case(rng)
        _, rows_native = extract_alignment_strings(q, records)
        os.environ["SIFT4G_TPU_NO_NATIVE"] = "1"
        try:
            _, rows_numpy = extract_alignment_strings(q, records)
        finally:
            del os.environ["SIFT4G_TPU_NO_NATIVE"]
        assert np.array_equal(rows_native, rows_numpy), f"trial {trial}"
        # scalar replay oracle (aligmentStr semantics, quirk Q6)
        for rec, row in zip(records, rows_native):
            want = np.full(len(q), ord("X") - ord("A"), dtype=np.uint8)
            qi, ti = rec.query_start, rec.target_start
            for m in rec.moves:
                if m == 1:
                    ti += 1
                elif m == 2:
                    qi += 1
                else:
                    want[qi] = rec.target_codes[ti]
                    qi += 1
                    ti += 1
            assert np.array_equal(row, want)


def test_native_extract_corrupt_stream_raises():
    """A move stream that runs MOVE_DIAG past its bounds raises (both
    backends fail the same way — advisor r4: the native path silently
    truncated instead)."""
    from sift4g_tpu import native
    from sift4g_tpu.align.records import AlignmentRecord
    from sift4g_tpu.core.chain import Chain
    from sift4g_tpu.sift.select import extract_alignment_strings

    if native.load() is None or not hasattr(
        native.load(), "sift4g_extract_checked"
    ):
        pytest.skip("checked native extract unavailable")
    q = Chain.from_string("Q", "ACDEFG")
    rec = AlignmentRecord(
        score=0, query_start=4, query_end=5, target_start=0, target_end=1,
        # 3 diagonal moves from query pos 4 in a 6-long query: runs off
        moves=np.asarray([0, 0, 0], dtype=np.uint8),
        target_name="t", target_codes=np.asarray([0, 1, 2], dtype=np.uint8),
    )
    with pytest.raises(IndexError):
        extract_alignment_strings(q, [rec])


def test_native_basic_matrix_bitwise_parity_fuzz():
    """native/median.cpp sift4g_basic_matrix vs the numpy
    create_matrix -> calc_seq_weights -> basic_matrix_construction
    pipeline: EXACT float64 equality (the C++ replicates numpy's
    pairwise/sequential reduction orders), including inf/nan positions
    (all-zero columns divide by zero exactly like numpy)."""
    from sift4g_tpu import native
    from sift4g_tpu.sift.scores import (
        _basic_matrix_native,
        basic_matrix_construction,
        calc_seq_weights,
        calculate_median_seq_info,
        create_matrix,
    )

    if native.load() is None or not hasattr(
        native.load(), "sift4g_basic_matrix"
    ):
        pytest.skip("native basic-matrix unavailable")
    rng = np.random.default_rng(41)
    STD = np.array([ord(c) - ord("A") for c in "ACDEFGHIKLMNPQRSTVWYBZ"])
    for trial in range(40):
        n = int(rng.integers(1, 420))
        L = int(rng.integers(1, 500))
        rows = rng.choice(STD, (n, L)).astype(np.uint8)
        # X noise + occasional all-X columns (nan rows downstream)
        xm = rng.random((n, L)) < 0.2
        rows[xm] = ord("X") - ord("A")
        if L > 3 and trial % 3 == 0:
            rows[:, int(rng.integers(L))] = ord("X") - ord("A")
        m = int(rng.integers(1, n + 1))
        keep = np.sort(rng.choice(n, m, replace=False))

        got = _basic_matrix_native(rows, keep)
        sub = rows[keep]
        raw, _ = create_matrix(sub, np.ones(m))
        sw, _ = calc_seq_weights(sub, raw)
        want = basic_matrix_construction(sub, sw)
        same = (got == want) | (np.isnan(got) & np.isnan(want))
        assert same.all(), (
            f"trial {trial}: {np.argwhere(~same)[:5]} "
            f"{got[~same][:3]} vs {want[~same][:3]}"
        )
        # and the downstream median is bit-equal too
        assert calculate_median_seq_info(got) == calculate_median_seq_info(want)


def test_native_seq_weights_bitwise_parity_fuzz():
    """sift4g_seq_weights vs numpy calc_seq_weights: exact float64
    equality of (weights, ndiff) on random full-row inputs."""
    from sift4g_tpu import native
    from sift4g_tpu.sift.predict_subst import _seq_weights_fast
    from sift4g_tpu.sift.scores import calc_seq_weights, create_matrix

    if native.load() is None or not hasattr(
        native.load(), "sift4g_seq_weights"
    ):
        pytest.skip("native seq-weights unavailable")
    rng = np.random.default_rng(47)
    STD = np.array([ord(c) - ord("A") for c in "ACDEFGHIKLMNPQRSTVWYBZ"])
    for trial in range(25):
        n = int(rng.integers(1, 420))
        L = int(rng.integers(1, 500))
        rows = rng.choice(STD, (n, L)).astype(np.uint8)
        xm = rng.random((n, L)) < 0.2
        rows[xm] = ord("X") - ord("A")
        raw, _ = create_matrix(rows, np.ones(n))
        got_w, got_nd = _seq_weights_fast(rows, raw)
        want_w, want_nd = calc_seq_weights(rows, raw)
        assert np.array_equal(got_nd, want_nd), trial
        assert np.array_equal(got_w, want_w), (
            f"trial {trial}: {np.abs(got_w - want_w).max()}"
        )
