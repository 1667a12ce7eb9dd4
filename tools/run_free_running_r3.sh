#!/bin/bash
# Round-3 free-running attack run (VERDICT r2 item #2): the headline
# recipe with reduction_factor=2 — the decoder emits 2 frames per
# position, halving the autoregressive step count.  Motivation (measured
# on the round-2 checkpoint, tools/eval_free_running.py):
#   - the free-running failure is PACING, not termination: stop-threshold
#     sweep was a dead lever, and inference prenet dropout neutral;
#   - items whose length tracks GT (len_ratio ~ 1.0) already reach
#     DTW-MCD 5-9, at or below the teacher-forced 7.9 — items that drawl
#     (1.3-1.8x) blow up to 17-24.
# Halving AR steps is the classic Tacotron lever against exactly this
# error-accumulation drawl.  CPU pilot (d128 2+2, 40 epochs, guided):
# see PERF.md round-3 section for the r=1 vs r=2 comparison that
# green-lit this run.
set -e
cd "$(dirname "$0")/.."
DATA=${1:-/tmp/conv_r2}
exec python -m transformertts_tpu.cli train \
  --set path.data=$DATA/LJSpeech-1.1 --set path.preprocessed=$DATA/prep \
  --set path.experiment=$DATA/exp \
  --set model.reduction_factor=2 \
  --set training.num_epochs=150 --set training.warmup_steps=1000 \
  --set training.log_interval=8 \
  --set loss.guided_attn_weight=10.0 \
  --exp-dir $DATA/exp/free_running_r3_r2
