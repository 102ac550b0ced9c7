"""Multi-host harness: 2 processes x 4 virtual devices, byte-identical output.

VERDICT r1 item 2: real ``jax.distributed.initialize`` (Gloo collectives),
record-aligned per-host database shards with global index offsets, O(k)
candidate/winner merges under the (score desc, id asc) total order, host-0
only writers — and the outputs must byte-equal the single-process run on
the bundled reference test set and on a synthetic database.

These spawn real subprocesses (the CPU analogue of one-process-per-host);
they are the heaviest tests in the suite.
"""

import filecmp
import os
import socket
import subprocess
import sys

import pytest

TEST_FILES = "/root/reference/test_files"
GOLDEN = os.path.join(os.path.dirname(__file__), "golden")
DRIVER = os.path.join(os.path.dirname(__file__), "mh_driver.py")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(TEST_FILES), reason="reference test files not mounted"
)


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _run_multihost(cli_args, timeout=420):
    """Spawn 2 driver processes; returns after both exit 0."""
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [
        subprocess.Popen(
            [sys.executable, DRIVER, str(pid), "2", str(port)] + cli_args,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env,
            cwd=os.path.dirname(os.path.dirname(DRIVER)),
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append((p.returncode, out, err))
    for rc, out, err in outs:
        assert rc == 0, f"driver failed rc={rc}\n{err.decode()[-3000:]}"


def test_multihost_bundled_testset_matches_goldens(tmp_path):
    out = tmp_path / "mh"
    out.mkdir()
    _run_multihost([
        "-q", os.path.join(TEST_FILES, "query.fasta"),
        "-d", os.path.join(TEST_FILES, "sample_protein_database.fa"),
        "--subst", TEST_FILES,
        "--out", str(out),
        "--backend", "numpy",
    ])
    for name in ("LACI_ECOLI", "PURR_SALTY"):
        got = out / f"{name}.SIFTprediction"
        want = os.path.join(GOLDEN, f"{name}.SIFTprediction")
        assert filecmp.cmp(got, want, shallow=False), f"{name} differs"


def test_multihost_synthetic_db_matches_single_process(tmp_path):
    """Sharded 2-host run == single-process run on a synthetic database
    (sub-results on, so the alignment report's scores/coords/order are
    byte-compared too)."""
    data = tmp_path / "data"
    subprocess.run(
        [sys.executable, os.path.join(os.path.dirname(os.path.dirname(DRIVER)),
                                      "tools", "make_synthetic_db.py"),
         str(data), "--n-db", "4000", "--n-q", "4", "--mean-len", "220"],
        check=True, capture_output=True,
        cwd=os.path.dirname(os.path.dirname(DRIVER)),
    )
    q, db = str(data / "queries.fa"), str(data / "db.fa")

    single = tmp_path / "single"
    single.mkdir()
    from sift4g_tpu.pipeline import PipelineConfig, run_pipeline

    cfg = PipelineConfig(
        query_path=q, database_path=db, out_path=str(single),
        align_backend="native", sub_results=True,
        log=open(os.devnull, "w"),
    )
    run_pipeline(cfg)

    multi = tmp_path / "multi"
    multi.mkdir()
    _run_multihost([
        "-q", q, "-d", db, "--out", str(multi),
        "--backend", "native", "--sub-results",
    ])

    names = sorted(os.listdir(single))
    assert names and names == sorted(os.listdir(multi))
    for name in names:
        assert filecmp.cmp(single / name, multi / name, shallow=False), (
            f"{name} differs between single-process and 2-host runs"
        )
