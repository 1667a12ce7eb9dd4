#!/bin/bash
# Round-5 closer: regenerate the flagship headline checkpoint.
#
# The 200-epoch extension regressed and rolling retention deleted the
# epoch-100 model that held the 5.76 headline (see PARITY.md).  This
# re-runs the SAME stacked recipe fresh (corpus v2 + guided w=10 +
# stop_gate_k=3, 100 epochs, same seed) with the new best-checkpoint
# retention active, so checkpoints_best/ holds the trajectory's best
# free-running model whenever training stops, then W-sweeps and packages
# it.  Repo-side markers; safe to rerun.
set -u
cd "$(dirname "$0")/.."
MARK=artifacts/.queue_state/markers
mkdir -p "$MARK"
V2=/tmp/conv_r4_4kv2

run() {
  local name=$1; shift
  local marker=$MARK/r5_done_${name}
  if [ -f "$marker" ]; then
    echo "[retrain] skip $name (marker exists)"
    return 0
  fi
  echo "[retrain] start $name $(date -u +%FT%TZ)"
  "$@" > /tmp/r5_${name}.log 2>&1
  local rc=$?
  echo "[retrain] exit  $name rc=$rc $(date -u +%FT%TZ)"
  if [ $rc -eq 0 ]; then touch "$marker"; fi
  return 0
}

run flagship_r5_train timeout 9600 python -m transformertts_tpu.cli train \
  --set path.data=$V2/LJSpeech-1.1 \
  --set path.preprocessed=$V2/prep \
  --set path.experiment=$V2/exp \
  --set training.num_epochs=100 --set training.warmup_steps=1000 \
  --set training.max_patience=100 \
  --set training.log_interval=16 \
  --set loss.guided_attn_weight=10.0 \
  --set loss.stop_gate_k=3 \
  --exp-dir $V2/exp/flagship_stack_r5

# eval + package even if the train was cut: checkpoints_best holds the
# best-so-far model either way
for W in 0 2; do
  run flagship_r5_eval_w$W timeout 1800 env JAX_PLATFORMS=cpu \
    python tools/eval_free_running.py \
    $V2/prep $V2/exp/flagship_stack_r5/checkpoints_best \
    --set runtime.decode_attn_window=$W \
    --tf --out artifacts/flagship_stack_r5/free_eval_best_w$W.json
done
run flagship_r5_package timeout 600 bash tools/package_convergence.sh \
  $V2/exp/flagship_stack_r5 artifacts/flagship_stack_r5
git add artifacts/flagship_stack_r5 2>/dev/null
git commit -q -m "Land artifacts/flagship_stack_r5: fresh 100-epoch stacked retrain with best-checkpoint retention" \
  -- artifacts/flagship_stack_r5 2>/dev/null || true
echo "[retrain] all jobs processed $(date -u +%FT%TZ)"
