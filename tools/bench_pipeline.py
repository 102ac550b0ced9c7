"""End-to-end pipeline benchmark on a synthetic database.

Usage:
  python tools/make_synthetic_db.py /tmp/synth --n-db 20000 --n-q 10
  python tools/bench_pipeline.py /tmp/synth [--backend auto] [--max-candidates 5000]

Prints per-phase timings (PhaseMetrics) and a queries/sec summary line.
"""

import argparse
import os
import sys
import time

# self-locating: works as a bare subprocess from any cwd even when the
# package is not installed in the venv
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("data_dir")
    ap.add_argument("--backend", default="auto")
    ap.add_argument("--max-candidates", type=int, default=5000)
    ap.add_argument("--out", default="")
    ap.add_argument("--repeat", action="store_true",
                    help="run twice; the second (warm) run excludes kernel compiles")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU platform (jax.config, pre-backend-init)")
    ap.add_argument("--overlap", default="auto", choices=["auto", "on", "off"],
                    help="prefilter/align overlap mode (A/B knob)")
    ap.add_argument("--predict-backend", default="host",
                    choices=["host", "device"],
                    help="matrix-mode prediction path (device = bucketed "
                    "vmapped scores, the many-query missense mode)")
    ap.add_argument("--resident-db", default="auto",
                    choices=["auto", "on", "off"],
                    help="HBM-resident database scoring (A/B knob)")
    ap.add_argument("--overlap-ab", action="store_true",
                    help="cold + three warm runs A/B-ing overlap on/off in "
                    "one process (one compile pass)")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from sift4g_tpu.pipeline import PipelineConfig, run_pipeline

    out_dir = args.out or os.path.join(args.data_dir, "out")
    os.makedirs(out_dir, exist_ok=True)
    cfg = PipelineConfig(
        query_path=os.path.join(args.data_dir, "queries.fa"),
        database_path=os.path.join(args.data_dir, "db.fa"),
        out_path=out_dir,
        align_backend=args.backend,
        max_candidates=args.max_candidates,
        timings=True,
        overlap=args.overlap,
        predict_backend=args.predict_backend,
        resident_db=args.resident_db,
    )
    if args.overlap_ab:
        # one process, one compile pass: cold(on) then warm A/B runs —
        # overlap on/off reuse identical kernel shapes; arms INTERLEAVE so
        # relay-latency drift hits both equally
        schedule = [("cold", "on"), ("warm-off", "off"), ("warm-on", "on"),
                    ("warm-off2", "off"), ("warm-on2", "on")]
    else:
        tags = ["cold", "warm"] if args.repeat else ["cold"]
        schedule = [(t, args.overlap) for t in tags]
    for tag, ov in schedule:
        cfg.overlap = ov
        t0 = time.perf_counter()
        queries = run_pipeline(cfg)
        dt = time.perf_counter() - t0
        print(
            f"pipeline[{tag}]: {len(queries)} queries in {dt:.2f}s "
            f"-> {len(queries) / dt:.3f} queries/s "
            f"[backend={args.backend} overlap={ov}]",
            file=sys.stderr,
        )


if __name__ == "__main__":
    main()
