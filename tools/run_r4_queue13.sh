#!/bin/bash
# Round-4 TPU job queue, stage 13: EMA parameter-averaging pilot.
#
# training.ema_decay (new this session) keeps an exponential moving
# average of the parameters updated every optimizer step and serves it
# for validation / free-running eval / synthesis (TrainState.eval_params).
# Rationale: the round-3/4 analyses traced free-running instability to
# per-utterance base quality + stop-head pacing; EMA weights are the
# classic cheap stabilizer for exactly this class of autoregressive
# inference noise, and no averaging lever has been measured yet.
#
# Recipe: byte-identical to artifacts/stopgate_k3 (1,024-clip corpus,
# parity model, guided w=10, stop_gate_k=3, 150 epochs) + ema_decay
# 0.995 (~200-step horizon ≈ 12 epochs at 16 steps/epoch) — one lever
# moved vs a committed baseline (free MCD-DTW 15.53, len 1.04).
set -u
cd "$(dirname "$0")/.."

# gate on queue12's repo-side completion marker (primary) or its log
# line (fallback for runs launched before the marker existed)
until [ -f artifacts/.queue_state/markers/r4b_done_queue12 ] ||       grep -q "all jobs processed" /tmp/r4_queue12.log 2>/dev/null; do
  sleep 60
done

run() {
  local name=$1; shift
  local marker=/tmp/r4b_done_${name}
  if [ -f "$marker" ]; then
    echo "[queue13] skip $name (marker exists)"
    return 0
  fi
  echo "[queue13] start $name $(date -u +%FT%TZ)"
  "$@" > /tmp/r4b_${name}.log 2>&1
  local rc=$?
  echo "[queue13] exit  $name rc=$rc $(date -u +%FT%TZ)"
  if [ $rc -eq 0 ]; then touch "$marker"; fi
  return 0
}

K1=/tmp/conv_r4_1k
run ema_pilot timeout 7200 python -m transformertts_tpu.cli train \
  --set path.data=$K1/LJSpeech-1.1 --set path.preprocessed=$K1/prep \
  --set path.experiment=$K1/exp \
  --set training.num_epochs=150 --set training.warmup_steps=1000 \
  --set training.log_interval=16 \
  --set training.ema_decay=0.995 \
  --set loss.guided_attn_weight=10.0 \
  --set loss.stop_gate_k=3 \
  --exp-dir $K1/exp/stopgate_ema
touch /tmp/r4b_done_ema_pilot
run eval_ema env JAX_PLATFORMS=cpu python tools/eval_free_running.py \
  $K1/prep $K1/exp/stopgate_ema/checkpoints \
  --set training.ema_decay=0.995 \
  --tf --out /tmp/free_eval_ema.json
run package_ema bash -c "
  bash tools/package_convergence.sh $K1/exp/stopgate_ema artifacts/stopgate_ema &&
  cp /tmp/free_eval_ema.json artifacts/stopgate_ema/free_eval_16_tf.json"
echo "[queue13] all jobs processed $(date -u +%FT%TZ)"
