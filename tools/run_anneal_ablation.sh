#!/bin/bash
# Round-4 guided-attention ANNEALING ablation (VERDICT r3 next #2):
# form the alignment with the guided auxiliary (w=10, the round-2/3
# headline recipe), then — once val diagonality first reaches 0.9 —
# decay the weight linearly to 0 over 20 epochs and train the REST of
# the run under the reference's exact loss (/root/reference/loss.py:9-55,
# masked MSE + stop BCE only).  If diagonality persists after the
# handoff, the shipped deviation shrinks from "different loss
# throughout" to "formation aid only".
#
# Same scale as tools/run_ablation_ga0.sh (1,024-clip proxy corpus,
# parity d256 3+3 model): 240 epochs so there is a long post-anneal
# stretch, patience 120 so a val plateau can't cut it short.
set -e
cd "$(dirname "$0")/.."
DATA=${1:-/tmp/conv_r4_1k}
exec python -m transformertts_tpu.cli train \
  --set path.data=$DATA/LJSpeech-1.1 --set path.preprocessed=$DATA/prep \
  --set path.experiment=$DATA/exp \
  --set training.num_epochs=240 --set training.warmup_steps=1000 \
  --set training.max_patience=120 \
  --set training.log_interval=16 \
  --set loss.guided_attn_weight=10.0 \
  --set loss.guided_attn_anneal_at_diag=0.9 \
  --set loss.guided_attn_anneal_epochs=20 \
  --exp-dir $DATA/exp/anneal_ablation
