#!/bin/bash
# Round-2 convergence artifact run (VERDICT item 2): reference-parity model
# on the 1024-clip phoneme-conditioned proxy corpus (tools/gen_synth_corpus.py),
# guided attention enabled, reference teacher-forcing schedule.
# Deviations from the reference regime, both forced by corpus size:
#   warmup_steps 1000 (ref 4000 assumes LJSpeech's ~37k accum steps)
#   num_epochs 150 with patience 50
set -e
cd "$(dirname "$0")/.."
DATA=${1:-/tmp/conv_r2}
exec python -m transformertts_tpu.cli train \
  --set path.data=$DATA/LJSpeech-1.1 --set path.preprocessed=$DATA/prep \
  --set path.experiment=$DATA/exp \
  --set training.num_epochs=150 --set training.warmup_steps=1000 \
  --set training.log_interval=8 \
  --set loss.guided_attn_weight=10.0 \
  --exp-dir $DATA/exp/convergence_r2
