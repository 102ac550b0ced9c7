"""Subprocess driver for the multi-host tests: one simulated host.

Usage: python mh_driver.py PID NPROC PORT QUERY DB OUT [--subst DIR] [extra
CLI args...].  Joins the 2-process Gloo-backed CPU job (4 virtual devices
per process = the 2-hosts x 4-chips topology of BASELINE config 3) and runs
the full multi-host pipeline through the real CLI entry point.
"""

import os
import sys

# hermetic import: the spawned process must find the package even when the
# repo isn't pip-installed (tests/ -> repo root)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    rest = sys.argv[4:]
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    os.environ["SIFT4G_COORDINATOR"] = f"127.0.0.1:{port}"
    os.environ["SIFT4G_NUM_PROCESSES"] = str(nproc)
    os.environ["SIFT4G_PROCESS_ID"] = str(pid)

    from sift4g_tpu.cli import main as cli_main

    return cli_main(["--platform", "cpu"] + rest)


if __name__ == "__main__":
    sys.exit(main())
