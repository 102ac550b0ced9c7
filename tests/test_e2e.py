"""Golden end-to-end regression on the bundled reference test data.

The reference binary cannot be built in this snapshot (the swsharp
submodule is empty), so the goldens were produced by this framework's
float64 NumPy semantic path after line-by-line verification against the
reference sources, and are locked here as regression oracles.  Both
backends must reproduce them byte-for-byte.
"""

import filecmp
import os

import pytest

from sift4g_tpu.pipeline import PipelineConfig, run_pipeline

TEST_FILES = "/root/reference/test_files"
GOLDEN = os.path.join(os.path.dirname(__file__), "golden")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(TEST_FILES), reason="reference test files not mounted"
)


def run(tmp_path, backend, subst, sub_results=False):
    cfg = PipelineConfig(
        query_path=os.path.join(TEST_FILES, "query.fasta"),
        database_path=os.path.join(TEST_FILES, "sample_protein_database.fa"),
        subst_path=TEST_FILES if subst else "",
        out_path=str(tmp_path),
        align_backend=backend,
        sub_results=sub_results,
        log=open(os.devnull, "w"),
    )
    run_pipeline(cfg)


@pytest.mark.parametrize("backend", ["numpy", "xla"])
def test_subst_predictions_golden(tmp_path, backend):
    run(tmp_path, backend, subst=True)
    for name in ("LACI_ECOLI", "PURR_SALTY"):
        got = tmp_path / f"{name}.SIFTprediction"
        want = os.path.join(GOLDEN, f"{name}.SIFTprediction")
        assert filecmp.cmp(got, want, shallow=False), f"{name} differs"


@pytest.mark.parametrize("backend", ["numpy", "xla"])
def test_matrix_predictions_golden(tmp_path, backend):
    run(tmp_path, backend, subst=False, sub_results=True)
    for name in ("LACI_ECOLI", "PURR_SALTY"):
        got = tmp_path / f"{name}.SIFTprediction"
        want = os.path.join(GOLDEN, f"{name}.matrix.SIFTprediction")
        assert filecmp.cmp(got, want, shallow=False), f"{name} differs"
    assert filecmp.cmp(
        tmp_path / "LACI_ECOLI.aligned.fasta",
        os.path.join(GOLDEN, "LACI_ECOLI.aligned.fasta"),
        shallow=False,
    )
    assert filecmp.cmp(
        tmp_path / "alignments.txt", os.path.join(GOLDEN, "alignments.txt"),
        shallow=False,
    )


def test_pallas_grouped_backend_golden(tmp_path, monkeypatch):
    """The grouped Pallas path (production TPU config) reproduces goldens.

    On the CPU test mesh the pallas backend normally routes through the
    sharded scorer; pin the grouped path by stripping the mesh and run the
    kernels in Mosaic interpret mode.
    """
    from jax.experimental.pallas import tpu as pltpu

    import sift4g_tpu.align.batch as batch_mod

    orig_init = batch_mod.BatchAligner.__init__

    def no_mesh_init(self, *a, **kw):
        orig_init(self, *a, **kw)
        self._mesh = None

    monkeypatch.setattr(batch_mod.BatchAligner, "__init__", no_mesh_init)
    with pltpu.force_tpu_interpret_mode():
        run(tmp_path, "pallas", subst=True)
    for name in ("LACI_ECOLI", "PURR_SALTY"):
        got = tmp_path / f"{name}.SIFTprediction"
        want = os.path.join(GOLDEN, f"{name}.SIFTprediction")
        assert filecmp.cmp(got, want, shallow=False), f"{name} differs"


def test_chunked_alignment_matches(tmp_path):
    """Tiny streaming chunks must not change any output (cross-chunk merge)."""
    cfg = PipelineConfig(
        query_path=os.path.join(TEST_FILES, "query.fasta"),
        database_path=os.path.join(TEST_FILES, "sample_protein_database.fa"),
        subst_path=TEST_FILES,
        out_path=str(tmp_path),
        align_backend="numpy",
        search_chunk_bytes=500,
        align_chunk_bytes=700,
        log=open(os.devnull, "w"),
    )
    run_pipeline(cfg)
    for name in ("LACI_ECOLI", "PURR_SALTY"):
        got = tmp_path / f"{name}.SIFTprediction"
        want = os.path.join(GOLDEN, f"{name}.SIFTprediction")
        assert filecmp.cmp(got, want, shallow=False), f"{name} differs"


def test_native_backend_golden(tmp_path):
    """Threaded C++ score backend (CPU deployments) reproduces goldens."""
    run(tmp_path, "native", subst=True)
    for name in ("LACI_ECOLI", "PURR_SALTY"):
        got = tmp_path / f"{name}.SIFTprediction"
        want = os.path.join(GOLDEN, f"{name}.SIFTprediction")
        assert filecmp.cmp(got, want, shallow=False), f"{name} differs"


@pytest.mark.parametrize("algorithm", ["NW", "HW", "OV"])
def test_other_algorithms_run(tmp_path, algorithm):
    """Non-default aligner modes run end-to-end and produce predictions."""
    cfg = PipelineConfig(
        query_path=os.path.join(TEST_FILES, "query.fasta"),
        database_path=os.path.join(TEST_FILES, "sample_protein_database.fa"),
        subst_path=TEST_FILES,
        out_path=str(tmp_path),
        align_backend="numpy",
        algorithm=algorithm,
        log=open(os.devnull, "w"),
    )
    run_pipeline(cfg)
    out = tmp_path / "LACI_ECOLI.SIFTprediction"
    assert out.exists() and out.read_text().count("\t") >= 3


def test_device_predict_backend_matrix_mode(tmp_path):
    """--predict-backend device: matrix-mode outputs agree with the golden
    float64 matrices to one printed digit (the device path is float32 and
    documented non-bit-parity; sift/predict_batch.py)."""
    import numpy as np

    cfg = PipelineConfig(
        query_path=os.path.join(TEST_FILES, "query.fasta"),
        database_path=os.path.join(TEST_FILES, "sample_protein_database.fa"),
        subst_path="",
        out_path=str(tmp_path),
        align_backend="numpy",
        predict_backend="device",
        log=open(os.devnull, "w"),
    )
    run_pipeline(cfg)

    def parse(path):
        vals = []
        with open(path) as fp:
            for line in fp:
                parts = line.split()
                if parts and parts[0] not in ("ID", "AC", "DE", "MA", "//") \
                        and not parts[0].isalpha():
                    vals.append([float(x) for x in parts])
        return np.asarray(vals)

    for name in ("LACI_ECOLI", "PURR_SALTY"):
        got = parse(tmp_path / f"{name}.SIFTprediction")
        want = parse(os.path.join(GOLDEN, f"{name}.matrix.SIFTprediction"))
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, atol=1.5e-4)


def test_device_predict_backend_subst_stays_host(tmp_path):
    """Subst-mode queries keep the bit-parity host oracle even under
    --predict-backend device (pipeline routing)."""
    cfg = PipelineConfig(
        query_path=os.path.join(TEST_FILES, "query.fasta"),
        database_path=os.path.join(TEST_FILES, "sample_protein_database.fa"),
        subst_path=TEST_FILES,
        out_path=str(tmp_path),
        align_backend="numpy",
        predict_backend="device",
        log=open(os.devnull, "w"),
    )
    run_pipeline(cfg)
    for name in ("LACI_ECOLI", "PURR_SALTY"):
        got = tmp_path / f"{name}.SIFTprediction"
        want = os.path.join(GOLDEN, f"{name}.SIFTprediction")
        assert filecmp.cmp(got, want, shallow=False), f"{name} differs"
