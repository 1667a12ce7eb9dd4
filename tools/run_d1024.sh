#!/bin/bash
# Round-4: put d1024 on silicon (VERDICT r3 next #4).
#
# configs/large_tp.yaml (BASELINE config 5's shape: d_model 1024, 6+6
# layers, 16 heads, ffn 4096 — 211M params) has only ever been exercised
# by config validation and CPU-mesh TP tests.  This script produces the
# missing hardware evidence on the one real chip:
#   1. bench.py at the d1024 shape (mesh_model=1 — single chip), giving
#      the step time for PERF.md's model-scale table and for the TP
#      efficiency projection;
#   2. a 20-epoch short train on the 1,024-clip proxy corpus to verify
#      the fused Pallas kernels and the full train loop hold at d1024
#      under real Mosaic (finite decreasing loss, no kernel rejects);
#   3. tools/scaling_estimate.py --tp-d1024 --step-ms <measured> on CPU,
#      completing the 2-chip TP efficiency projection with a measured
#      denominator.
set -u
cd "$(dirname "$0")/.."

D1024="model.d_model=1024 model.encoder_n_layers=6 model.decoder_n_layers=6 \
  model.encoder_n_head=16 model.decoder_n_head=16 \
  model.encoder_d_ffn=4096 model.decoder_d_ffn=4096"

echo "=== 1. d1024 single-chip bench $(date -u +%FT%TZ)"
BENCH_NO_RECORD=1 BENCH_DEADLINE_S=1200 timeout 1400 \
  python bench.py $D1024 > /tmp/d1024_bench.out 2> /tmp/d1024_bench.err
rc=$?
echo "bench rc=$rc $(tail -1 /tmp/d1024_bench.out)"
if [ $rc -ne 0 ]; then
  # on bench failure bench_details.json still holds the committed
  # parity-config numbers — copying it would silently feed a d256 step
  # time into the d1024 TP projection below.  Abort instead.
  echo "bench failed; NOT deriving the d1024 projection from stale details"
  exit 1
fi
# bench.py overwrites bench_details.json; keep the d1024 details under
# their own name and restore the committed parity-config file.
cp bench_details.json d1024_bench_details.json
git checkout -- bench_details.json

echo "=== 2. d1024 short train (20 epochs, 1k proxy corpus) $(date -u +%FT%TZ)"
DATA=${1:-/tmp/conv_r4_1k}
timeout 3600 python -m transformertts_tpu.cli train \
  --config configs/large_tp.yaml \
  --set runtime.mesh_model=1 \
  --set path.data=$DATA/LJSpeech-1.1 --set path.preprocessed=$DATA/prep \
  --set path.experiment=$DATA/exp \
  --set training.num_epochs=20 --set training.warmup_steps=300 \
  --set training.log_interval=8 \
  --set loss.guided_attn_weight=10.0 \
  --exp-dir $DATA/exp/d1024_short > /tmp/d1024_train.log 2>&1
echo "train rc=$? $(grep -c 'epoch' /tmp/d1024_train.log) epoch lines"

echo "=== 3. TP efficiency projection with measured step time $(date -u +%FT%TZ)"
STEP_MS=$(python -c "import json; print(json.load(open('d1024_bench_details.json'))['step_time_ms'])")
JAX_PLATFORMS=cpu timeout 900 python tools/scaling_estimate.py \
  --tp-d1024 --step-ms "$STEP_MS" --out scaling_estimate_tp_d1024.json \
  > /tmp/d1024_scaling.log 2>&1
echo "scaling rc=$? step_ms=$STEP_MS"
echo "=== done $(date -u +%FT%TZ)"
