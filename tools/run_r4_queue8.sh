#!/bin/bash
# Round-4 TPU job queue, stage 8: d1024 short-train retry.
#
# The first attempt (stage 2 of tools/run_d1024.sh) died at the epoch-3
# recompile (the scheduled-sampling step's first compile at a new bucket)
# when the fused-LN backward's fixed 512-row blocks needed 16.59 MiB of
# Mosaic stack at d=1024 vs the 16 MiB scoped-VMEM limit
# (/tmp/d1024_train.log).  ops/pallas/fused_ln.py now scales row blocks
# with d (256 rows at d1024); this rerun resumes from the epoch-2
# checkpoint and completes the 20-epoch verification, then packages the
# history as the d1024-on-silicon artifact.
set -u
cd "$(dirname "$0")/.."

until grep -q "all jobs processed" /tmp/r4_queue7.log 2>/dev/null; do
  sleep 60
done

run() {
  local name=$1; shift
  local marker=/tmp/r4_done_${name}
  if [ -f "$marker" ]; then
    echo "[queue8] skip $name (marker exists)"
    return 0
  fi
  echo "[queue8] start $name $(date -u +%FT%TZ)"
  "$@" > /tmp/r4_${name}.log 2>&1
  local rc=$?
  echo "[queue8] exit  $name rc=$rc $(date -u +%FT%TZ)"
  if [ $rc -eq 0 ]; then touch "$marker"; fi
  return 0
}

DATA=/tmp/conv_r4_1k
run d1024_train timeout 3600 python -m transformertts_tpu.cli train \
  --config configs/large_tp.yaml \
  --set runtime.mesh_model=1 \
  --set path.data=$DATA/LJSpeech-1.1 --set path.preprocessed=$DATA/prep \
  --set path.experiment=$DATA/exp \
  --set training.num_epochs=20 --set training.warmup_steps=300 \
  --set training.log_interval=8 \
  --set loss.guided_attn_weight=10.0 \
  --exp-dir $DATA/exp/d1024_short

run d1024_package bash tools/package_convergence.sh \
  $DATA/exp/d1024_short artifacts/d1024_short
echo "[queue8] all jobs processed $(date -u +%FT%TZ)"
