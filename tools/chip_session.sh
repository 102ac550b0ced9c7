#!/bin/bash
# Queued chip work.  Round-4 sessions (2026-08-20) COMPLETED:
#   * reworked bench validated twice (47.9-48.3 GCUPS, 85.8-86.4% of
#     in-run roofline, marginal 104%);
#   * 2000q x 2M warm headline 47.8 s (arms: 76.7 pre-coalescing -> 57.3
#     coalescing -> 52.3 + striped traceback -> 47.8 + native select
#     plumbing + int8 predict packing), outputs byte-identical;
#   * 2000q x 5M re-measure with all round-4 levers: 70.2 s warm
#     (was 118.7 r3, 291.6 r2); cold arms 660-1326 s (service mood).
#
# GENUINELY OPEN:
#   a. Proteome-scale missense: 20k queries x 2M (dataset /tmp/mq20k):
#        timeout 7200 python tools/bench_pipeline.py /tmp/mq20k --resident-db on --predict-backend device --repeat
#   b. G=128 grids at serve-daemon warmth (expect +5% kernel; 1049 s
#      compile per shape — daemon-only, never in the bench window):
#        SIFT4G_TPU_G_CHUNK=128 sift4g-tpu --serve /tmp/s.sock &
#        sift4g-tpu --connect /tmp/s.sock -q ... -d ...   # twice; warm 2nd
#   c. Denser 64-base rung ladder at daemon warmth (x1.29 -> x1.24
#      padding, 2x jit shapes — same caveat):
#        SIFT4G_TPU_T_BUCKET=64 sift4g-tpu --serve /tmp/s.sock &
#
# Run steps MANUALLY one at a time — one TPU process at a time on this
# machine (docs/PLATFORM.md), and a wedged compile can take the relay
# down; probe between steps:
#
#   python -c "import socket; s=socket.socket(); s.settimeout(3); s.connect(('127.0.0.1',8082)); print('up')"
#
# Datasets: /tmp/mq2m, /tmp/mq5m, /tmp/mq20k (mutated-homolog queries;
# rebuild with tools/make_synthetic_db.py if /tmp was wiped — seeds are
# fixed, e.g.: python tools/make_synthetic_db.py /tmp/mq2m --n-db 2000000 --n-q 2000).
echo "This file is a runbook; execute steps manually (see comments)."
