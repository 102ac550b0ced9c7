#!/bin/bash
# Queued chip work.  Round-4 session (2026-08-20) COMPLETED: reworked
# bench validated twice (47.9-48.3 GCUPS, 85.8-86.4% of in-run roofline,
# marginal 104%); 2000q x 2M warm headline 52.3 s (arms: 76.7 pre-
# coalescing -> 57.3 coalescing -> 52.3 + striped traceback), outputs
# byte-identical, cold arms 314-1223 s (pure compile-service mood).
#
# GENUINELY OPEN:
#   a. 5M re-measure with all round-4 levers (dataset /tmp/mq5m):
#        timeout 3600 python tools/bench_pipeline.py /tmp/mq5m --resident-db on --predict-backend device --repeat
#      (round-3 record 118.7 s warm; expect ~85-95 s)
#   b. Proteome-scale missense: 20k queries x 2M (generate first,
#      CPU-heavy — do not generate while a chip arm is timing):
#        python tools/make_synthetic_db.py /tmp/mq20k --n-db 2000000 --n-q 20000
#        timeout 7200 python tools/bench_pipeline.py /tmp/mq20k --resident-db on --predict-backend device --repeat
#   c. G=128 grids at serve-daemon warmth (expect +5% kernel; 1049 s
#      compile — daemon-only, never in the bench window).
#   d. Denser 64-base rung ladder at daemon warmth (x1.29 -> x1.24,
#      2x jit shapes — same caveat).
#
# Run steps MANUALLY one at a time — one TPU process at a time on this
# machine (docs/PLATFORM.md), and a wedged compile can take the relay
# down; probe between steps:
#
#   python -c "import socket; s=socket.socket(); s.settimeout(3); s.connect(('127.0.0.1',8082)); print('up')"
#
# Datasets: /tmp/mq2m, /tmp/mq5m (mutated-homolog queries; rebuild with
# tools/make_synthetic_db.py if /tmp was wiped — see ROADMAP/README).
echo "This file is a runbook; execute steps manually (see comments)."
