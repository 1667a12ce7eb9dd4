#!/bin/bash
# Round-4 stop-head lever (VERDICT r3 next #5): the tolerant stop-gate
# target.  The round-3 headline run's pacing failures (val_stop_recall_2
# 0.41 at best-val, free len-ratio drifting 1.01 -> 1.18, 1.3-1.8x
# "drawl" items) point at the stop head; every inference-side lever
# measured dead.  This is the first TRAINING-side lever: gate=1 over the
# last k=3 valid frames (loss.stop_gate_k=3; the reference's target is
# the exact last frame only, loss.py:31) — 3x the positive mass, same
# pos_weight 8.  Otherwise byte-identical to the round-3 headline recipe
# (tools/run_convergence_tpu.sh / run_headline_r3.sh): 1,024-clip proxy
# corpus, parity model, guided w=10, 150 epochs.
# Measured against convergence_r3_tpu on: val_stop_recall(+-2),
# free_len_ratio, free_mcd_dtw per epoch + final 16-item eval.
set -e
cd "$(dirname "$0")/.."
DATA=${1:-/tmp/conv_r4_1k}
exec python -m transformertts_tpu.cli train \
  --set path.data=$DATA/LJSpeech-1.1 --set path.preprocessed=$DATA/prep \
  --set path.experiment=$DATA/exp \
  --set training.num_epochs=150 --set training.warmup_steps=1000 \
  --set training.log_interval=16 \
  --set loss.guided_attn_weight=10.0 \
  --set loss.stop_gate_k=3 \
  --exp-dir $DATA/exp/stopgate_k3
