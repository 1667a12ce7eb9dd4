#!/bin/bash
# Paper-config (6+6, d=512, 8 heads, ffn 2048) tuning sweep (VERDICT weak #8:
# "the paper config has had only one tuning pass").  Each variant is a full
# bench.py run at the paper model size; BENCH_NO_RECORD=1 keeps these runs
# from replacing the parity-config replay record (bench_last_good.json).
#
# Usage: bash tools/tune_paper.sh  (TPU tunnel must be up)
set -u
cd "$(dirname "$0")/.."
LOGDIR=${TUNE_LOGDIR:-/tmp/tune_paper}
mkdir -p "$LOGDIR"
export BENCH_NO_RECORD=1  # don't replace the parity-config replay record

PAPER="model.encoder_n_layers=6 model.decoder_n_layers=6 \
  model.d_model=512 model.encoder_n_head=8 model.decoder_n_head=8 \
  model.encoder_d_ffn=2048 model.decoder_d_ffn=2048"

run() { # name extra-args...
  local name=$1; shift
  echo "=== $name: $*"
  BENCH_DEADLINE_S=600 timeout 700 python bench.py $PAPER "$@" \
    >"$LOGDIR/$name.out" 2>"$LOGDIR/$name.err"
  echo "rc=$? $(tail -1 "$LOGDIR/$name.out")"
}

run base
# bigger micro-batch, fewer accum steps (same effective batch 64):
run b32a2 training.batch_size=32 training.grad_acc_steps=2
run b64a1 training.batch_size=64 training.grad_acc_steps=1
# larger effective batch (pure throughput ceiling probe):
run b32a4 training.batch_size=32
# kernel gates at d=512:
run noflash runtime.use_pallas_attention=false
run nofusedln runtime.use_pallas_fused_ln=false
run fusedffn runtime.use_pallas_fused_ffn=true

echo "=== summary"
for f in "$LOGDIR"/*.out; do echo "$(basename "$f"): $(tail -1 "$f")"; done
