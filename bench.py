"""Benchmark: SW scoring throughput (GCUPS) on the available accelerator.

Workload: one LACI-length query (360 aa) scored against a padded batch of
512-aa targets — the shape class of the pipeline's hot phase (SW rescoring
of prefilter candidates, reference database_alignment.cpp:21-127).  Cells
are counted the reference's way: |q| x sum(|t|) true DP cells
(database_search.cpp:126,182).

Baseline: the reference publishes no numbers (BASELINE.md) and its CUDA/C
compute library (swsharp) is an empty submodule, so the comparison point
is SIFT4G's CPU build order-of-magnitude of ~2 GCUPS on a multicore host
(typical Smith-Waterman CPU throughput for this codebase's era; documented
assumption, not a measurement).

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

BASELINE_GCUPS = 2.0  # assumed reference CPU build throughput (see docstring)


def bench_sw_gcups(batch=512, n=512, m=360, iters=20, backend=None):
    import jax

    from sift4g_tpu.align.batch import BatchAligner  # noqa: F401 (import check)
    from sift4g_tpu.align.xla import PAD_CODE, _extend_matrix
    from sift4g_tpu.core.scorers import create_scorer

    if backend is None:
        from sift4g_tpu.align import best_backend

        backend = best_backend()
    if backend == "pallas":
        from sift4g_tpu.align.pallas_sw import sw_scores_pallas as kernel_fn
    else:
        from sift4g_tpu.align.xla import align_scores_kernel as kernel_fn

    scorer = create_scorer("BLOSUM_62", 10, 1)
    matrix32 = _extend_matrix(scorer.matrix)
    rng = np.random.default_rng(42)

    m_pad = -(-m // 64) * 64
    q = np.full(m_pad, PAD_CODE, dtype=np.int32)
    q[:m] = rng.integers(0, 26, size=m)
    # a unique target batch per call: repeated identical dispatches were
    # measured to overstate throughput ~10x on this platform.  Do NOT run
    # other large jitted programs in this process first — a co-resident
    # program with GB-scale HBM intermediates degrades subsequent calls
    # ~100x (measured; see align/pallas_sw.py docstring).
    targets = [
        jax.numpy.asarray(rng.integers(0, 26, size=(batch, n)).astype(np.int32))
        for _ in range(iters)
    ]
    lens = jax.numpy.asarray(np.full(batch, n, dtype=np.int32))
    q_dev = jax.numpy.asarray(q)
    qlen = jax.numpy.int32(m)
    m32 = jax.numpy.asarray(matrix32)

    out = kernel_fn(q_dev, qlen, targets[0], lens, m32, mode="SW")  # compile
    jax.block_until_ready(out)

    t0 = time.perf_counter()
    outs = [
        kernel_fn(q_dev, qlen, targets[i], lens, m32, mode="SW")
        for i in range(iters)
    ]
    jax.block_until_ready(outs)
    dt = time.perf_counter() - t0

    cells = m * batch * n * iters
    return cells / dt / 1e9, backend


def main():
    gcups, backend = bench_sw_gcups()
    print(
        json.dumps(
            {
                "metric": f"sw_score_gcups[{backend}]",
                "value": round(gcups, 3),
                "unit": "GCUPS",
                "vs_baseline": round(gcups / BASELINE_GCUPS, 2),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
