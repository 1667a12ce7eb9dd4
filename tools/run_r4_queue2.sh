#!/bin/bash
# Round-4 TPU job queue, stage 2: waits for the corpus-v2 flagship
# (run_r4_queue3.sh — reordered ahead of it mid-round for schedule
# safety: the v2 flagship is the highest-value chip job), then runs:
#   4. d1024 on silicon (bench + 20-epoch short train + TP projection)
#   5. batched decode megakernel numerics A/B on the trained flagship
#      checkpoint (VERDICT r3 weak #2)
set -u
cd "$(dirname "$0")/.."

until grep -q "all jobs processed" /tmp/r4_queue3.log 2>/dev/null; do
  sleep 60
done

run() {
  local name=$1; shift
  local marker=/tmp/r4_done_${name}
  if [ -f "$marker" ]; then
    echo "[queue2] skip $name (marker exists)"
    return 0
  fi
  echo "[queue2] start $name $(date -u +%FT%TZ)"
  "$@" > /tmp/r4_${name}.log 2>&1
  local rc=$?
  echo "[queue2] exit  $name rc=$rc $(date -u +%FT%TZ)"
  if [ $rc -eq 0 ]; then touch "$marker"; fi
  return 0
}

run d1024 bash tools/run_d1024.sh
run mega_numerics timeout 2400 python tools/ab_mega_numerics.py \
  /tmp/conv_r3_ga0_4k/prep \
  /tmp/conv_r3_ga0_4k/exp/flagship_4k/checkpoints \
  --out ab_mega_numerics.json
echo "[queue2] all jobs processed $(date -u +%FT%TZ)"
