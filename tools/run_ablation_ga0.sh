#!/bin/bash
# Round-3 guided-attention-0 ablation (VERDICT round-2 missing #1):
# the reference's EXACT loss — masked MSE + stop BCE only, NO guided
# attention (/root/reference/loss.py:9-55 has no such term) — at the
# parity config on the same 1024-clip phoneme-conditioned proxy corpus
# as the round-2 headline run. The question: does alignment diagonality
# form under the reference's own recipe, or was the round-2 auxiliary
# loss doing load-bearing work?
#
# Differences vs tools/run_convergence_tpu.sh:
#   loss.guided_attn_weight=0.0   (the ablation itself)
#   num_epochs 240, patience 120  (alignment may form slower without the
#                                  auxiliary loss; don't early-stop on a
#                                  val-loss plateau before it has a chance)
# Everything else identical: warmup 1000, batch 16 x accum 4, Noam,
# reference TF schedule 1.0 -> 0.05, log_interval 8.
set -e
cd "$(dirname "$0")/.."
DATA=${1:-/tmp/conv_r3_ga0}
SRC=${2:-/tmp/conv_r2}
# Reuse the round-2 corpus + preprocessed features byte-for-byte so the
# only variable is the loss.
mkdir -p "$DATA"
[ -e "$DATA/LJSpeech-1.1" ] || ln -s "$SRC/LJSpeech-1.1" "$DATA/LJSpeech-1.1"
[ -e "$DATA/prep" ] || ln -s "$SRC/prep" "$DATA/prep"
exec python -m transformertts_tpu.cli train \
  --set path.data=$DATA/LJSpeech-1.1 --set path.preprocessed=$DATA/prep \
  --set path.experiment=$DATA/exp \
  --set training.num_epochs=240 --set training.warmup_steps=1000 \
  --set training.max_patience=120 \
  --set training.log_interval=8 \
  --set loss.guided_attn_weight=0.0 \
  --exp-dir $DATA/exp/ablation_ga0
