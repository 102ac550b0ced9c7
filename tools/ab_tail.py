"""Chip A/B: tail-group width policy (full vs pow2) on the missense align
phase with the HBM-resident database.  Run ONE arm per process (compile
shapes differ); interleave arms across processes and take best-of per arm
(relay mood dominates single samples — docs/PLATFORM.md).

Usage:  python tools/ab_tail.py full|pow2 [data_dir]
"""
import os, sys, time

policy = sys.argv[1]
data = sys.argv[2] if len(sys.argv) > 2 else "/tmp/mq2m"
os.environ["SIFT4G_TPU_TAIL_POLICY"] = policy

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.argv = [
    "sift4g-tpu",
    "-q", f"{data}/queries.fa",
    "-d", f"{data}/db.fa",
    "--out", f"{data}/out_tail_{policy}",
    "--resident-db", "on",
    "--timings",
]
from sift4g_tpu.cli import main
t0 = time.perf_counter()
rc = main()
print(f"ARM {policy}: e2e {time.perf_counter()-t0:.1f}s rc={rc}")
