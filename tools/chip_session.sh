#!/bin/bash
# Queued chip work for the next hardware session.  2026-08-19 session
# CLEARED the round-3 backlog: step 1 bench 48.3 GCUPS (earlier), step 2
# screening A/B (ON wins, 83.1 vs 94.2 s align), step 4 tail A/B (pow2
# wins 49.6 vs 83.1 s align — now the default), step 3 5M resident A/B
# (see PLATFORM.md), plus the warm missense headline 77.4 s at 2000qx2M.
# REMAINING queue: a production-shape make_grouped_sharded(kernel=
# "pallas") single-chip sanity launch; G=128 under a warm serve daemon
# (expect +5% kernel, 1049 s compile); a warm 2M e2e re-measure with the
# vectorized matrix writer (expect predict 22.5 -> ~10 s).
# Run steps MANUALLY one at a time — one TPU process
# at a time on this machine (docs/PLATFORM.md), and a wedged compile can
# take the relay down; probe between steps:
#
#   python -c "import socket; s=socket.socket(); s.settimeout(3); s.connect(('127.0.0.1',8082)); print('up')"
#
# 1. Driver bench number — round 3's #1 deliverable (VERDICT r2 item 1).
#    bench.py now retries a refused probe for SIFT4G_TPU_RELAY_WAIT s
#    (default 600) and stamps "relay" into the JSON:
#      timeout 2400 python bench.py
#    Expect sw_score_gcups[pallas-grouped] >= 47.5 (+ roofline_pct).
#
# 2. Device-side E-value screening A/B at 2000q x 2M (VERDICT r2 item 3;
#    target: warm align <= ~25 s from 60.2 resident / 128.8 slab).
#    Screening is ON by default; SIFT4G_TPU_SCREEN=0 is the control arm.
#    Interleave arms, one process each, warm second run is the number:
#      timeout 3600 python tools/bench_pipeline.py /tmp/mq2m --resident-db on --repeat
#      timeout 3600 SIFT4G_TPU_SCREEN=0 python tools/bench_pipeline.py /tmp/mq2m --resident-db on --repeat
#      (repeat the pair; also run a --resident-db off pair if time allows)
#    NOTE: screened launches are NEW jit shapes (fused sort + (G,K) out)
#    — the first screened run pays fresh Mosaic compiles; schedule few
#    distinct shapes (default ladder only) and let the warm run speak.
#    Record per-phase align.fetch from SIFT4G_TPU_SEARCH_STATS/--timings:
#    the hypothesis under test is that fetch bytes (45 MB -> ~2 MB) are
#    the 47.2 s; if fetch does NOT drop, the tax is dispatch-side and the
#    next lever is fewer/larger launches (G=128 at serve-daemon warmth).
#
# 3. Resident 5M on-chip A/B (3 segments; carried from round 2):
#      timeout 3600 python tools/bench_pipeline.py /tmp/mq5m --resident-db on --repeat
#      timeout 3600 python tools/bench_pipeline.py /tmp/mq5m --resident-db off --repeat
#
# 4. Tail-policy A/B at 2M missense (arms differ in jit shapes — one
#    process per arm, interleave, best-of):
#      timeout 3600 python tools/ab_tail.py full  /tmp/mq2m
#      timeout 3600 python tools/ab_tail.py pow2  /tmp/mq2m
#    Decide the tail_policy default from the warm align-phase times.
#    (With screening the fetch no longer scales with padding, so pow2's
#    win shrinks to kernel time only — re-evaluate, don't assume.)
#
# 5. If time remains: warm missense e2e re-measure with screening +
#    search speedups (--predict-backend device; round-2 number 291.6 ->
#    151.4 resident; target < 100 s), 20q x 5M warm e2e, a
#    production-shape make_grouped_sharded(kernel="pallas") single-chip
#    sanity launch, G=128 under a warm serve daemon.
#
# Datasets: /tmp/mq2m, /tmp/mq5m (mutated-homolog queries; rebuild with
# tools/make_synthetic_db.py if /tmp was wiped — see ROADMAP/README).
echo "This file is a runbook; execute steps manually (see comments)."
