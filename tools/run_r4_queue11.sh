#!/bin/bash
# Round-4 TPU job queue, stage 11: warm serving re-bench + stack extension.
#
#   1. bench_serving rerun through Synthesizer.warmup() — the first
#      measurement's conc-8 row carried a 21 s B=8 cold compile inside a
#      request latency; this run pre-compiles every (bucket, batch)
#      graph so all three rows are steady-state.
#   2. Extend the stacked flagship (corpus v2 + stop_gate_k=3) from 100
#      to 200 epochs: the round-4 frontier (free MCD-DTW ~13) is
#      data/step-bound per the round-3/4 analyses, and the reference
#      trains ~13x more steps than the 100-epoch proxy runs; the
#      trainer resumes from the stage-9 checkpoint.
#   3. Final eval + repackage of the artifact at whatever epoch stands.
set -u
cd "$(dirname "$0")/.."

until grep -q "all jobs processed" /tmp/r4_queue10.log 2>/dev/null; do
  sleep 60
done

run() {
  local name=$1; shift
  local marker=/tmp/r4_done_${name}
  if [ -f "$marker" ]; then
    echo "[queue11] skip $name (marker exists)"
    return 0
  fi
  echo "[queue11] start $name $(date -u +%FT%TZ)"
  "$@" > /tmp/r4_${name}.log 2>&1
  local rc=$?
  echo "[queue11] exit  $name rc=$rc $(date -u +%FT%TZ)"
  if [ $rc -eq 0 ]; then touch "$marker"; fi
  return 0
}

run bench_serving_warm timeout 2400 python tools/bench_serving.py \
  /tmp/conv_r3_ga0_4k/prep \
  /tmp/conv_r3_ga0_4k/exp/flagship_4k/checkpoints \
  --set path.data=/tmp/conv_r3_ga0_4k/LJSpeech-1.1 \
  --conc 1,4,8 --reqs 4 --out bench_serving_warm.json

run stack_extend timeout 10800 python -m transformertts_tpu.cli train \
  --set path.data=/tmp/conv_r4_4kv2/LJSpeech-1.1 \
  --set path.preprocessed=/tmp/conv_r4_4kv2/prep \
  --set path.experiment=/tmp/conv_r4_4kv2/exp \
  --set training.num_epochs=200 --set training.warmup_steps=1000 \
  --set training.max_patience=100 \
  --set training.log_interval=16 \
  --set loss.guided_attn_weight=10.0 \
  --set loss.stop_gate_k=3 \
  --exp-dir /tmp/conv_r4_4kv2/exp/flagship_stack
touch /tmp/r4_done_stack_extend

run eval_stack_200 env JAX_PLATFORMS=cpu python tools/eval_free_running.py \
  /tmp/conv_r4_4kv2/prep \
  /tmp/conv_r4_4kv2/exp/flagship_stack/checkpoints \
  --tf --out /tmp/free_eval_stack_200.json

run stack_repackage bash tools/package_convergence.sh \
  /tmp/conv_r4_4kv2/exp/flagship_stack artifacts/flagship_stack
echo "[queue11] all jobs processed $(date -u +%FT%TZ)"
