#!/bin/bash
# Round-4 TPU job queue, stage 9: finish the stacked flagship.
#
# Stage 6 bounded the corpus-v2 + stop_gate_k=3 run to 2 h so the
# queue kept moving (~epoch 85 of 100 at the observed 82 s/epoch) and
# evaluated whatever checkpoint existed.  This stage resumes the run to
# the full 100 epochs (the trainer resumes from checkpoints; resumed
# history epochs are excluded from the new-epoch count), re-runs the
# 16-item free eval with per-item teacher-forced MCD, and packages the
# artifact.
set -u
cd "$(dirname "$0")/.."

until grep -q "all jobs processed" /tmp/r4_queue8.log 2>/dev/null; do
  sleep 60
done

run() {
  local name=$1; shift
  local marker=/tmp/r4_done_${name}
  if [ -f "$marker" ]; then
    echo "[queue9] skip $name (marker exists)"
    return 0
  fi
  echo "[queue9] start $name $(date -u +%FT%TZ)"
  "$@" > /tmp/r4_${name}.log 2>&1
  local rc=$?
  echo "[queue9] exit  $name rc=$rc $(date -u +%FT%TZ)"
  if [ $rc -eq 0 ]; then touch "$marker"; fi
  return 0
}

run stack_finish timeout 3600 python -m transformertts_tpu.cli train \
  --set path.data=/tmp/conv_r4_4kv2/LJSpeech-1.1 \
  --set path.preprocessed=/tmp/conv_r4_4kv2/prep \
  --set path.experiment=/tmp/conv_r4_4kv2/exp \
  --set training.num_epochs=100 --set training.warmup_steps=1000 \
  --set training.max_patience=100 \
  --set training.log_interval=16 \
  --set loss.guided_attn_weight=10.0 \
  --set loss.stop_gate_k=3 \
  --exp-dir /tmp/conv_r4_4kv2/exp/flagship_stack

run eval_stack_final env JAX_PLATFORMS=cpu python tools/eval_free_running.py \
  /tmp/conv_r4_4kv2/prep \
  /tmp/conv_r4_4kv2/exp/flagship_stack/checkpoints \
  --tf --out /tmp/free_eval_stack_final.json

run stack_package bash tools/package_convergence.sh \
  /tmp/conv_r4_4kv2/exp/flagship_stack artifacts/flagship_stack
echo "[queue9] all jobs processed $(date -u +%FT%TZ)"
