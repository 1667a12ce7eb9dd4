#!/bin/bash
# Round-4 TPU job queue, stage 4: waits for the stacked flagship (stage 6), then runs the
# serving-throughput bench on the trained flagship checkpoint (the
# measured counterpart to the DynamicBatcher/serve-http feature).
set -u
cd "$(dirname "$0")/.."

until grep -q "all jobs processed" /tmp/r4_queue6.log 2>/dev/null; do
  sleep 60
done

run() {
  local name=$1; shift
  local marker=/tmp/r4_done_${name}
  if [ -f "$marker" ]; then
    echo "[queue4] skip $name (marker exists)"
    return 0
  fi
  echo "[queue4] start $name $(date -u +%FT%TZ)"
  "$@" > /tmp/r4_${name}.log 2>&1
  local rc=$?
  echo "[queue4] exit  $name rc=$rc $(date -u +%FT%TZ)"
  if [ $rc -eq 0 ]; then touch "$marker"; fi
  return 0
}

run bench_serving timeout 2400 python tools/bench_serving.py \
  /tmp/conv_r3_ga0_4k/prep \
  /tmp/conv_r3_ga0_4k/exp/flagship_4k/checkpoints \
  --set path.data=/tmp/conv_r3_ga0_4k/LJSpeech-1.1 \
  --conc 1,4,8 --reqs 4 --out bench_serving.json
echo "[queue4] all jobs processed $(date -u +%FT%TZ)"
