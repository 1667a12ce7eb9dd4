#!/bin/bash
# Round-3 VERDICT #1 follow-up, second data point on the recipe/corpus
# dependence of alignment formation.
#
# The first unguided run (tools/run_ablation_ga0.sh) gave the reference's
# exact loss — masked MSE + stop BCE, NO guided attention
# (/root/reference/loss.py:9-55) — 240 epochs on the round-2 1024-clip
# proxy corpus and alignment never formed: val diagonality stayed in
# [0.3588, 0.3604] for all 2,880 steps while teacher-forced mel L1 fell
# to 0.17.  But 2,880 steps is a short leash: the reference aligns on
# 13,100 REAL clips over ~74k steps (/root/reference/readme.md:31-41).
#
# This run scales both axes as far as one session allows: 4,096 clips
# (4x data) x 100 epochs = 6.1k steps (2.1x), everything else identical
# (parity d256 3+3 model, warmup 1000, batch 16 x accum 4, Noam,
# reference TF schedule linear 1.0 -> 0.05, guided_attn_weight=0.0).
# If diagonality forms here, the 1k-clip corpus was the limiter and the
# reference recipe aligns at scale; if not, we have a two-point negative
# (1k/2.9k and 4k/6.1k) quantifying the dependence.
set -e
cd "$(dirname "$0")/.."
DATA=${1:-/tmp/conv_r3_ga0_4k}
mkdir -p "$DATA"
if [ ! -e "$DATA/LJSpeech-1.1/metadata.csv" ]; then
  JAX_PLATFORMS=cpu python tools/gen_synth_corpus.py "$DATA" 4096 1
fi
if [ ! -e "$DATA/prep/stats.json" ]; then
  JAX_PLATFORMS=cpu python -m transformertts_tpu.cli preprocess \
    --set path.data=$DATA/LJSpeech-1.1 --set path.preprocessed=$DATA/prep
fi
exec python -m transformertts_tpu.cli train \
  --set path.data=$DATA/LJSpeech-1.1 --set path.preprocessed=$DATA/prep \
  --set path.experiment=$DATA/exp \
  --set training.num_epochs=100 --set training.warmup_steps=1000 \
  --set training.max_patience=100 \
  --set training.log_interval=16 \
  --set loss.guided_attn_weight=0.0 \
  --exp-dir "$DATA/exp/ablation_ga0_4k"
