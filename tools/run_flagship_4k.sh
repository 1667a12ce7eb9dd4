#!/bin/bash
# Round-3 flagship scale-up: the headline recipe (guided w=10, parity
# model) on the 4,096-clip proxy corpus (4x the data of the round-2/3
# headline runs).  Motivation: (a) the unguided 4k ablation reached
# teacher-forced mel L1 0.130 vs the 1k headline's 0.190 — more data
# directly improves base quality; (b) the round-3 free-running analysis
# (PARITY.md) shows free-running error is per-utterance teacher-forced
# difficulty amplified ~2.2x, so the data lever is THE lever for the
# free-running gap.  100 epochs = 5,700 steps, ~2.8 h on one v5e.
set -e
cd "$(dirname "$0")/.."
DATA=${1:-/tmp/conv_r3_ga0_4k}
exec python -m transformertts_tpu.cli train \
  --set path.data=$DATA/LJSpeech-1.1 --set path.preprocessed=$DATA/prep \
  --set path.experiment=$DATA/exp \
  --set training.num_epochs=100 --set training.warmup_steps=1000 \
  --set training.max_patience=100 \
  --set training.log_interval=16 \
  --set loss.guided_attn_weight=10.0 \
  --exp-dir $DATA/exp/flagship_4k
