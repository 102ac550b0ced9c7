#!/bin/bash
# Queued chip work.
#
# ROUND-5 sessions (2026-08-20) superseded several round-4 conclusions
# below — current state (docs/PLATFORM.md "Round 5", docs/KNOBS.md):
#   * bench 49.9 GCUPS (quad-packed plane prologue; marginal 99.5-104%
#     of same-session roofline);
#   * 20k x 2M warm records: matrix 415.9 s, SUBST 430.0 s (1.03x;
#     byte-identical to the float64 oracle);
#   * Q_CHUNK=64 + resident-drop is now the AUTO policy at >= 5000
#     device queries (predict 62.9 -> 49.5 s at 20k) — the round-4
#     "reverted Q_CHUNK=64" note below predates the drop enabler;
#   * subst finishers run on a spawn process pool from 256 queries;
#   * 5M ladder point NOT refreshed (relay dispatch degradation all
#     afternoon; r4's 70.2 s stands);
#   * A/B protocol at 20k scale: per-arm --json files +
#     `tools/bench_pipeline.py --aggregate` (per-mode best-of-phases).
#
# Round-4 sessions (2026-08-20) COMPLETED:
#   * reworked bench validated twice (47.9-48.3 GCUPS, 85.8-86.4% of
#     in-run roofline, marginal 104%);
#   * 2000q x 2M warm headline 47.8 s; 2000q x 5M 70.2 s warm;
#   * 20k q x 2M proteome-scale warm: 433.2 s (46.2 q/s) — align 320.5,
#     predict 73.6, search 35.5, select 3.7 (cold 1272 s);
#   * predict Q_CHUNK A/B: 64 wins 1.39x ISOLATED but loses 2x
#     in-pipeline next to the resident DB (HBM pressure) — default 32;
#   * prefilter huge-page hint: NET LOSS on this VM (docs/PLATFORM.md),
#     default off; single-load denial gate landed (bit-identical).
#   * daemon arms at 2000q x 2M: production-default warm 51.0 s (the
#     60.0 s arm was the since-reverted Q_CHUNK=64; align 35.8-37.0 both).
#
#   * daemon-warmth align knobs BOTH FLAT (docs/PLATFORM.md): G=128
#     warm align 35.6 s vs base 35.8 (cold tax 2295 s); T_BUCKET=64
#     37.3 s.  Knobs stay A/B-only.
#
# GENUINELY OPEN: none queued — the align phase is at its structural
# limit at current shapes; next wins would need a padded-cell reduction
# below x1.66 that does not multiply jit shapes.
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
