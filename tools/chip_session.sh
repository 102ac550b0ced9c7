#!/bin/bash
# Queued chip work for the next hardware session (round 2, tunnel outage
# 2026-08-18).  Run steps MANUALLY one at a time — one TPU process at a
# time on this machine (docs/PLATFORM.md), and a wedged compile can take
# the relay down; probe between steps:
#
#   python -c "import socket; s=socket.socket(); s.settimeout(3); s.connect(('127.0.0.1',8082)); print('up')"
#
# 1. Driver bench number (fresh process, ~25 min budget for compiles):
#      timeout 2400 python bench.py
#
# 2. Resident 5M on-chip A/B (3 segments; serialized fresh-shape compiles
#    are in place — see PLATFORM.md "Compile-service wedge"):
#      timeout 3600 python tools/bench_pipeline.py /tmp/mq5m --resident-db on --repeat
#      timeout 3600 python tools/bench_pipeline.py /tmp/mq5m --resident-db off --repeat
#    (interleave again if relay mood is noisy; warm second run is the number)
#
# 3. Tail-policy A/B at 2M missense (arms differ in jit shapes — one
#    process per arm, interleave, best-of):
#      timeout 3600 python tools/ab_tail.py full  /tmp/mq2m
#      timeout 3600 python tools/ab_tail.py pow2  /tmp/mq2m
#      timeout 3600 python tools/ab_tail.py full  /tmp/mq2m
#      timeout 3600 python tools/ab_tail.py pow2  /tmp/mq2m
#    Decide the tail_policy default from the warm align-phase times.
#
# 4. Warm missense e2e re-measure with the 5x search + oracle speedups
#    (updates README "many-query axis"; expect ~170s from 291.6):
#      timeout 3600 python tools/bench_pipeline.py /tmp/mq5m --repeat --predict-backend device
#
# 5. If time remains: 20q x 5M warm e2e (README table), GCUPS spot-check.
#
# Datasets: /tmp/mq2m, /tmp/mq5m (mutated-homolog queries; rebuild with
# tools/make_synthetic_db.py if /tmp was wiped — see ROADMAP/README).
echo "This file is a runbook; execute steps manually (see comments)."
