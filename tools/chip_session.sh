#!/bin/bash
# Queued chip work for the next hardware session.  Status as of round 4
# start (2026-08-19): the round-3 backlog is CLEARED — bench verified at
# 48.3 GCUPS (builder session; the round-3 DRIVER capture read 39.978 —
# see VERDICT r3 weak #1 and the bench.py self-diagnosis rework),
# screening A/B (ON wins), tail A/B (pow2 wins, now default), 5M resident
# A/B (118.7 vs 138.6 s), production-shape sharded-pallas sanity
# (48.2 vs 48.3 GCUPS bit-equal, commit 0324c6e), and the matrix writer
# vectorization (predict 26.8 -> 12.1 s at 2000 files in the 5M arms).
#
# GENUINELY OPEN A/Bs:
#   a. Reworked bench.py validation: convergence warmup + marginal_gcups +
#      in-run roofline.  Expect value >= 47, marginal_roofline_pct 97-100.
#        timeout 2400 python bench.py
#   b. Fresh 2000q x 2M e2e re-measure with the vectorized matrix writer +
#      predict-phase host work (round-4): expect predict 22.5 -> <8 s.
#        timeout 3600 python tools/bench_pipeline.py /tmp/mq2m --resident-db on --repeat
#   c. Padding-density arms (VERDICT r3 item 2): remainder-group
#      coalescing / denser ladder — warm align target <= ~35 s (from 44.4).
#   d. G=128 under a warm serve daemon (expect +5% kernel, 1049 s compile
#      — daemon-only, never in the bench window).
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
