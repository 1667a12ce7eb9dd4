#!/bin/bash
# Round-4 TPU job queue, stage 3: waits for stage 1 (run_r4_queue.sh)
# so the chip is free, then runs the corpus-v2 flagship (the
# distribution lever on the hard-half free-running gap) and a final
# 16-item free eval of its checkpoint.
set -u
cd "$(dirname "$0")/.."

until grep -q "all jobs processed" /tmp/r4_queue.log 2>/dev/null; do
  sleep 60
done

run() {
  local name=$1; shift
  local marker=/tmp/r4_done_${name}
  if [ -f "$marker" ]; then
    echo "[queue3] skip $name (marker exists)"
    return 0
  fi
  echo "[queue3] start $name $(date -u +%FT%TZ)"
  "$@" > /tmp/r4_${name}.log 2>&1
  local rc=$?
  echo "[queue3] exit  $name rc=$rc $(date -u +%FT%TZ)"
  if [ $rc -eq 0 ]; then touch "$marker"; fi
  return 0
}

run flagship_4kv2 bash tools/run_flagship_4kv2.sh
run eval_4kv2 env JAX_PLATFORMS=cpu python tools/eval_free_running.py \
  /tmp/conv_r4_4kv2/prep \
  /tmp/conv_r4_4kv2/exp/flagship_4kv2/checkpoints \
  --out /tmp/free_eval_flagship4kv2.json
echo "[queue3] all jobs processed $(date -u +%FT%TZ)"
