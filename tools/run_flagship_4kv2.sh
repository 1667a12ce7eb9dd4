#!/bin/bash
# Round-4 corpus-v2 flagship: the distribution lever on the hard half.
#
# flagship_4k (artifacts/flagship_4k/) confirmed the data-volume lever:
# easy val items reached teacher-forced quality free-running, but the
# hard half (free MCD-DTW ~20) barely moved — and the round-4 analysis
# found why: v1 training text is 100% template grammar, so the val set's
# diverse sentences are out-of-distribution.  Corpus v2
# (gen_synth_corpus.py --v2) gives the TRAIN split diverse-register mass
# (300-sentence bank, every other train slot) while keeping every val
# utterance byte-identical.  Same recipe and scale as flagship_4k
# otherwise: one lever moved, at constant data volume.
set -e
cd "$(dirname "$0")/.."
DATA=${1:-/tmp/conv_r4_4kv2}
if [ ! -e "$DATA/LJSpeech-1.1/metadata.csv" ]; then
  JAX_PLATFORMS=cpu python tools/gen_synth_corpus.py "$DATA" 4096 1 --v2
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
  --set loss.guided_attn_weight=10.0 \
  --exp-dir $DATA/exp/flagship_4kv2
