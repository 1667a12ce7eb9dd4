#!/bin/bash
# Round-4 TPU job queue, stage 6: the STACKED recipe — corpus v2 (diverse
# train register) + tolerant stop gate k=3 — after d1024/mega finish.
#
# Motivation: the two round-4 levers measured independently:
#   corpus v1->4k data:      free MCD-DTW 17.29 -> 15.40, len 1.18 -> 1.07
#   stop gate k=3 (1k data): free MCD-DTW 17.29 -> 15.53, len 1.18 -> 1.04
# They act through different mechanisms (base quality vs pacing), so the
# stack is the best-known recipe; this run measures whether they compose.
set -u
cd "$(dirname "$0")/.."

until grep -q "all jobs processed" /tmp/r4_queue2.log 2>/dev/null; do
  sleep 60
done

run() {
  local name=$1; shift
  local marker=/tmp/r4_done_${name}
  if [ -f "$marker" ]; then
    echo "[queue6] skip $name (marker exists)"
    return 0
  fi
  echo "[queue6] start $name $(date -u +%FT%TZ)"
  "$@" > /tmp/r4_${name}.log 2>&1
  local rc=$?
  echo "[queue6] exit  $name rc=$rc $(date -u +%FT%TZ)"
  if [ $rc -eq 0 ]; then touch "$marker"; fi
  return 0
}

# Schedule-bounded: the driver's end-of-round bench needs the chip, so
# cap the training; if it's cut short, evaluate the latest checkpoint
# anyway (the CLI resumes from checkpoints, so a rerun continues).
run flagship_stack timeout 7200 python -m transformertts_tpu.cli train \
  --set path.data=/tmp/conv_r4_4kv2/LJSpeech-1.1 \
  --set path.preprocessed=/tmp/conv_r4_4kv2/prep \
  --set path.experiment=/tmp/conv_r4_4kv2/exp \
  --set training.num_epochs=100 --set training.warmup_steps=1000 \
  --set training.max_patience=100 \
  --set training.log_interval=16 \
  --set loss.guided_attn_weight=10.0 \
  --set loss.stop_gate_k=3 \
  --exp-dir /tmp/conv_r4_4kv2/exp/flagship_stack
# eval regardless of the train rc: a timeout-cut run still has
# checkpoints worth measuring
touch /tmp/r4_done_flagship_stack
run eval_stack env JAX_PLATFORMS=cpu python tools/eval_free_running.py \
  /tmp/conv_r4_4kv2/prep \
  /tmp/conv_r4_4kv2/exp/flagship_stack/checkpoints \
  --tf --out /tmp/free_eval_stack.json
echo "[queue6] all jobs processed $(date -u +%FT%TZ)"
