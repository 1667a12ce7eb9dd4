#!/bin/bash
# Round-3 headline convergence artifact (VERDICT r2 items #2/#3):
# identical recipe to the round-2 headline (tools/run_convergence_tpu.sh —
# parity model, guided_attn_weight=10, warmup 1000, 150 epochs, SAME
# 1024-clip corpus/prep under /tmp/conv_r2), re-run so that
#   - val_stop_recall_2 is computed with the fixed bucket-padding-aware
#     metric (train/metrics.py) for the WHOLE history — no known-bad
#     columns, no footnotes;
#   - free-running quality is recorded per epoch as BOTH frame-wise
#     free_mcd and DTW-aligned free_mcd_dtw (metrics.mcd_dtw), so the
#     train/infer gap is reported straight and decomposed into pacing
#     vs spectral error.
set -e
cd "$(dirname "$0")/.."
DATA=${1:-/tmp/conv_r2}
exec python -m transformertts_tpu.cli train \
  --set path.data=$DATA/LJSpeech-1.1 --set path.preprocessed=$DATA/prep \
  --set path.experiment=$DATA/exp \
  --set training.num_epochs=150 --set training.warmup_steps=1000 \
  --set training.log_interval=8 \
  --set loss.guided_attn_weight=10.0 \
  --exp-dir $DATA/exp/headline_r3
