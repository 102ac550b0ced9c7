"""PhaseMetrics counters + the pure-Python fallback toggles."""

import io
import os
import subprocess
import sys

import numpy as np

from sift4g_tpu.utils import PhaseMetrics


def test_phase_metrics_report():
    out = io.StringIO()
    m = PhaseMetrics(log=out, enabled=True)
    with m.phase("align"):
        pass
    m.add("align", cells=2e9)
    m.phases["align"]["seconds"] = 1.0  # deterministic rate
    assert m.rate("align", "cells") == 2e9
    m.report()
    text = out.getvalue()
    assert "align" in text and "GCUPS" in text


def test_pipeline_runs_without_native(tmp_path):
    """SIFT4G_TPU_NO_NATIVE=1 must produce byte-identical predictions."""
    env = dict(os.environ, SIFT4G_TPU_NO_NATIVE="1")
    code = (
        "import jax; jax.config.update('jax_platforms','cpu');"
        "from sift4g_tpu.pipeline import PipelineConfig, run_pipeline;"
        "import os,sys;"
        "cfg=PipelineConfig("
        "query_path='/root/reference/test_files/query.fasta',"
        "database_path='/root/reference/test_files/sample_protein_database.fa',"
        f"subst_path='/root/reference/test_files',out_path={str(tmp_path)!r},"
        "align_backend='numpy',log=open(os.devnull,'w'));"
        "run_pipeline(cfg)"
    )
    subprocess.run([sys.executable, "-c", code], env=env, check=True, timeout=300)
    golden = os.path.join(os.path.dirname(__file__), "golden")
    for name in ("LACI_ECOLI", "PURR_SALTY"):
        got = (tmp_path / f"{name}.SIFTprediction").read_text()
        want = open(os.path.join(golden, f"{name}.SIFTprediction")).read()
        assert got == want, name
