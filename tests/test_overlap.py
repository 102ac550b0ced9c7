"""Overlapped pipeline (prefilter + provisional scoring) == two-phase.

VERDICT r1 item 4: the overlap must not change ANY output byte.  The
synthetic run forces many small search chunks and a small max_candidates
so later chunks evict earlier provisional candidates — exercising the
superset-then-drop merge logic.
"""

import filecmp
import os
import subprocess
import sys

import numpy as np
import pytest

from sift4g_tpu import native
from sift4g_tpu.pipeline import PipelineConfig, run_pipeline

pytestmark = pytest.mark.skipif(
    native.load() is None, reason="native engine unavailable"
)


def _make_db(tmp_path, n_db=1500, n_q=3, seed=3):
    rng = np.random.default_rng(seed)
    aas = np.frombuffer(b"ARNDCQEGHILKMFPSTWYV", dtype=np.uint8)
    db = tmp_path / "db.fa"
    with open(db, "wb") as fh:
        for i in range(n_db):
            seq = rng.choice(aas, size=int(rng.integers(50, 400))).tobytes()
            fh.write(b">s%d\n%s\n" % (i, seq))
    q = tmp_path / "q.fa"
    with open(q, "wb") as fh:
        for i in range(n_q):
            seq = rng.choice(aas, size=int(rng.integers(80, 200))).tobytes()
            fh.write(b">q%d\n%s\n" % (i, seq))
    return str(q), str(db)


def test_overlapped_pipeline_matches_two_phase(tmp_path):
    q, db = _make_db(tmp_path)
    outs = {}
    for mode in ("off", "on"):
        out = tmp_path / mode
        out.mkdir()
        cfg = PipelineConfig(
            query_path=q, database_path=db, out_path=str(out),
            align_backend="numpy", sub_results=True,
            max_candidates=40,               # forces cross-chunk evictions
            search_chunk_bytes=40_000,       # many chunks
            overlap=mode,
            log=open(os.devnull, "w"),
        )
        run_pipeline(cfg)
        outs[mode] = out
    names = sorted(os.listdir(outs["off"]))
    assert names and names == sorted(os.listdir(outs["on"]))
    for name in names:
        assert filecmp.cmp(
            outs["off"] / name, outs["on"] / name, shallow=False
        ), f"{name} differs between two-phase and overlapped runs"


def test_overlap_auto_gates_off_without_cache(tmp_path, monkeypatch):
    """auto/on still produce correct output when the cache cannot exist
    (unwritable dir is simulated by the no-cache env): the pipeline falls
    back to two-phase rather than failing."""
    q, db = _make_db(tmp_path, n_db=300)
    ref_out = tmp_path / "ref"
    ref_out.mkdir()
    cfg = PipelineConfig(
        query_path=q, database_path=db, out_path=str(ref_out),
        align_backend="numpy", sub_results=True, overlap="off",
        log=open(os.devnull, "w"),
    )
    run_pipeline(cfg)

    monkeypatch.setenv("SIFT4G_TPU_NO_FASTA_CACHE", "1")
    got_out = tmp_path / "got"
    got_out.mkdir()
    cfg2 = PipelineConfig(
        query_path=q, database_path=db, out_path=str(got_out),
        align_backend="numpy", sub_results=True, overlap="on",
        log=open(os.devnull, "w"),
    )
    run_pipeline(cfg2)
    names = sorted(os.listdir(ref_out))
    assert names == sorted(os.listdir(got_out))
    for name in names:
        assert filecmp.cmp(ref_out / name, got_out / name, shallow=False)


def test_overlap_auto_gates_on_core_count(tmp_path, monkeypatch):
    """auto resolves OFF below 8 host cores (the relay client's dispatch
    work costs ~a core while the scan runs — measured net loss on a
    4-core host, docs/PLATFORM.md); explicit "on" is not core-gated."""
    import sift4g_tpu.pipeline as P

    q, db = _make_db(tmp_path, n_db=50)
    cfg = PipelineConfig(
        query_path=q, database_path=db, out_path=str(tmp_path),
        align_backend="native", overlap="auto", log=open(os.devnull, "w"),
    )
    monkeypatch.setattr(P.os, "sched_getaffinity", lambda pid: set(range(4)))
    assert P._overlap_cache(cfg) is None
    monkeypatch.setattr(P.os, "sched_getaffinity", lambda pid: set(range(16)))
    # with >= 8 cores, auto proceeds to the accelerator gate (cpu -> None
    # on the hermetic test platform, exercising the next condition)
    import jax

    expect_none = jax.devices()[0].platform == "cpu"
    got = P._overlap_cache(cfg)
    if expect_none:
        assert got is None
    cfg.overlap = "on"
    got_on = P._overlap_cache(cfg)
    assert got_on is not None  # explicit on: no core or platform gate


def test_overlap_refuses_at_many_query_scale(tmp_path):
    """VERDICT r2 item 7: prov would need n_queries * max_candidates dict
    entries; above the budget the overlap refuses LOUDLY under `on` and
    the pipeline falls back to two-phase."""
    import io

    import sift4g_tpu.pipeline as P

    log = io.StringIO()
    cfg = PipelineConfig(
        database_path="/nonexistent", overlap="on",
        max_candidates=5000, log=log,
    )
    assert P._overlap_cache(cfg, n_queries=10_001) is None
    assert "refused" in log.getvalue()
    assert "SIFT4G_TPU_OVERLAP_PROV_BUDGET" in log.getvalue()

    # auto refuses silently at the same scale
    log2 = io.StringIO()
    cfg2 = PipelineConfig(
        database_path="/nonexistent", overlap="auto",
        max_candidates=5000, log=log2,
    )
    assert P._overlap_cache(cfg2, n_queries=10_001) is None
    assert log2.getvalue() == ""


def test_overlap_compaction_is_exact(tmp_path, monkeypatch):
    """Forcing snapshot compaction every chunk (cap=0) must not change a
    single output byte: evicted ids never re-enter (Q3 monotone floor),
    so pruning them is exact."""
    q, db = _make_db(tmp_path, n_db=1200, seed=11)
    outs = {}
    for mode, cap in (("off", None), ("on", "0")):
        out = tmp_path / f"compact_{mode}"
        out.mkdir()
        if cap is None:
            monkeypatch.delenv("SIFT4G_TPU_OVERLAP_COMPACT_CAP", raising=False)
        else:
            monkeypatch.setenv("SIFT4G_TPU_OVERLAP_COMPACT_CAP", cap)
        cfg = PipelineConfig(
            query_path=q, database_path=db, out_path=str(out),
            align_backend="numpy", sub_results=True,
            max_candidates=30,               # cross-chunk evictions
            search_chunk_bytes=30_000,       # many chunks
            overlap=mode,
            log=open(os.devnull, "w"),
        )
        run_pipeline(cfg)
        outs[mode] = out
    names = sorted(os.listdir(outs["off"]))
    assert names and names == sorted(os.listdir(outs["on"]))
    for name in names:
        assert filecmp.cmp(
            outs["off"] / name, outs["on"] / name, shallow=False
        ), f"{name} differs with forced compaction"


def test_overlap_with_device_subst_hybrid_matches_oracle(tmp_path):
    """The overlapped pipeline composed with --predict-backend device and
    subst-mode queries (the full round-5 production stack on CPU):
    byte-identical to the two-phase host-oracle run."""
    rng = np.random.default_rng(23)
    aas = np.frombuffer(b"ARNDCQEGHILKMFPSTWYV", dtype=np.uint8)
    db = tmp_path / "db.fa"
    qs = [
        rng.choice(aas, size=int(rng.integers(80, 200))).tobytes()
        for _ in range(3)
    ]
    with open(db, "wb") as fh:
        for i in range(1200):
            seq = rng.choice(aas, size=int(rng.integers(50, 400))).tobytes()
            fh.write(b">s%d\n%s\n" % (i, seq))
        for i, s in enumerate(qs):  # homologs pass the E-value filter
            fh.write(b">h%d\n%s\n" % (i, s))
    q = tmp_path / "q.fa"
    with open(q, "wb") as fh:
        for i, s in enumerate(qs):
            fh.write(b">q%d\n%s\n" % (i, s))
    subst = tmp_path / "subst"
    subst.mkdir()
    for i, s in enumerate(qs):
        with open(subst / f"q{i}.subst", "w") as fh:
            for p in sorted(rng.choice(len(s), 4, replace=False).tolist()):
                fh.write(f"{chr(s[p])}{p + 1}{chr(int(rng.choice(aas)))}\n")

    outs = {}
    for tag, (ov, pb) in {
        "oracle": ("off", "host"), "stack": ("on", "device"),
    }.items():
        out = tmp_path / tag
        out.mkdir()
        cfg = PipelineConfig(
            query_path=str(q), database_path=str(db), out_path=str(out),
            align_backend="numpy", subst_path=str(subst),
            max_candidates=40, search_chunk_bytes=40_000,
            overlap=ov, predict_backend=pb,
            log=open(os.devnull, "w"),
        )
        run_pipeline(cfg)
        outs[tag] = out
    names = sorted(
        f for f in os.listdir(outs["oracle"]) if f.endswith(".SIFTprediction")
    )
    assert len(names) == 3
    for name in names:
        assert filecmp.cmp(
            outs["oracle"] / name, outs["stack"] / name, shallow=False
        ), name
