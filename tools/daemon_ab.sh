#!/bin/bash
# Daemon-warmth A/B for one knob setting (runbook items b/c).
#
# Usage:
#   tools/daemon_ab.sh <tag> <data_dir> [ENV=VAL ...]
# e.g.
#   tools/daemon_ab.sh base   /tmp/mq2m
#   tools/daemon_ab.sh g128   /tmp/mq2m SIFT4G_TPU_G_CHUNK=128
#   tools/daemon_ab.sh tb64   /tmp/mq2m SIFT4G_TPU_T_BUCKET=64
#
# Starts a --serve daemon with the knob env set, submits the standard
# missense job twice (cold then warm; the warm second connect is the
# honest number — compile tax is minutes/shape and the persistent cache
# is inoperative), prints both wall times, then shuts the daemon down by
# socket (never by process pattern).  ONE TPU process at a time on this
# machine: do not run while bench_pipeline or another daemon is up.
set -u
TAG=$1; DATA=$2; shift 2
SOCK=/tmp/s4g_ab_${TAG}.sock
LOG=/tmp/daemon_${TAG}.log
OUT=/tmp/daemon_${TAG}_out
PLATFORM=${S4G_AB_PLATFORM:-auto}   # set =cpu to smoke-test the harness
rm -f "$SOCK" "$LOG".connect; rm -rf "$OUT"; mkdir -p "$OUT"

env "$@" python -m sift4g_tpu.cli --serve "$SOCK" --platform "$PLATFORM" >"$LOG" 2>&1 &
DPID=$!
echo "daemon[$TAG] pid=$DPID env: $*"
for i in $(seq 1 60); do [ -S "$SOCK" ] && break; sleep 1; done
[ -S "$SOCK" ] || {
  echo "daemon failed to come up; log:"; tail "$LOG"
  kill "$DPID" 2>/dev/null   # never orphan a TPU-holding process
  exit 1
}

run_once () {
  local label=$1
  local t0=$(date +%s.%N)
  python -m sift4g_tpu.cli --connect "$SOCK" \
    -q "$DATA/queries.fa" -d "$DATA/db.fa" --out "$OUT" \
    --predict-backend device --resident-db on --timings \
    >>"$LOG".connect 2>&1
  local rc=$?
  local t1=$(date +%s.%N)
  echo "connect[$TAG/$label]: rc=$rc wall=$(awk -v a="$t0" -v b="$t1" 'BEGIN{printf "%.1f", b-a}') s"
}

run_once cold
run_once warm
# per-phase breakdown of the LAST (warm) job
echo "--- warm phase report ---"
tail -30 "$LOG".connect
# bounded shutdown: a daemon wedged mid-compile never answers the socket
timeout 60 python -m sift4g_tpu.cli --connect "$SOCK" --shutdown >/dev/null 2>&1 \
  || kill "$DPID" 2>/dev/null
for i in $(seq 1 30); do kill -0 "$DPID" 2>/dev/null || break; sleep 1; done
kill -0 "$DPID" 2>/dev/null && kill -9 "$DPID" 2>/dev/null
wait "$DPID" 2>/dev/null
echo "daemon[$TAG] stopped"
