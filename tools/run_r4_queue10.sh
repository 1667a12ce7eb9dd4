#!/bin/bash
# Round-4 TPU job queue, stage 10: speculative-decode A/B on silicon.
#
# The new opt-in speculative chunk-verify decode (runtime.
# decode_speculative_k, infer/decode.py:_speculative_decode) amortizes
# the B=1 launch-bound step cost over the accepted draft run.  This
# stage measures, on the trained flagship_4k checkpoint: latency/
# frames-per-s vs the XLA loop AND the batch-1 megakernel, the real
# draft acceptance rate, and the free-running quality delta (MCD-DTW,
# len ratio) of the approximate accepted outputs.
set -u
cd "$(dirname "$0")/.."

until grep -q "all jobs processed" /tmp/r4_queue9.log 2>/dev/null; do
  sleep 60
done

run() {
  local name=$1; shift
  local marker=/tmp/r4_done_${name}
  if [ -f "$marker" ]; then
    echo "[queue10] skip $name (marker exists)"
    return 0
  fi
  echo "[queue10] start $name $(date -u +%FT%TZ)"
  "$@" > /tmp/r4_${name}.log 2>&1
  local rc=$?
  echo "[queue10] exit  $name rc=$rc $(date -u +%FT%TZ)"
  if [ $rc -eq 0 ]; then touch "$marker"; fi
  return 0
}

run spec_decode timeout 3000 python tools/ab_spec_decode.py \
  /tmp/conv_r3_ga0_4k/prep \
  /tmp/conv_r3_ga0_4k/exp/flagship_4k/checkpoints \
  --n 8 --grid 2:0.2,4:0.1,4:0.2,4:0.4,8:0.2,4:0.2:hold,4:0.4:hold \
  --out ab_spec_decode.json
echo "[queue10] all jobs processed $(date -u +%FT%TZ)"
