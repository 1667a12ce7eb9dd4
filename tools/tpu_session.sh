#!/bin/bash
# Unattended round-2 TPU session (ROADMAP "TPU session queue").
#
# The axon TPU tunnel has hours-long outages and admits a single client, so
# this script (a) polls with short subprocess probes until the tunnel
# answers, then (b) runs the whole measurement queue sequentially, each step
# under its own `timeout`, logging everything under $LOGDIR.  Steps that
# fail or hang never block the rest of the queue.
#
# Usage: bash tools/tpu_session.sh [max_poll_hours]
set -u
cd "$(dirname "$0")/.."
LOGDIR=${TPU_SESSION_LOGDIR:-/tmp/tpu_session_r2}
mkdir -p "$LOGDIR"
MAX_POLL_H=${1:-9}
DEADLINE=$(( $(date +%s) + MAX_POLL_H * 3600 ))

log() { echo "[$(date +%H:%M:%S)] $*" | tee -a "$LOGDIR/session.log"; }

log "polling for TPU tunnel (up to ${MAX_POLL_H}h)..."
while true; do
  if timeout 90 python -c "import jax; assert jax.devices()[0].platform=='tpu'" \
      >/dev/null 2>&1; then
    log "TPU tunnel UP"
    break
  fi
  if [ "$(date +%s)" -gt "$DEADLINE" ]; then
    log "tunnel never answered within ${MAX_POLL_H}h; giving up"
    exit 1
  fi
  sleep 90
done

run_step() { # name timeout_s cmd...
  local name=$1 tmo=$2; shift 2
  log "START $name (timeout ${tmo}s): $*"
  timeout "$tmo" "$@" >"$LOGDIR/$name.out" 2>"$LOGDIR/$name.err"
  local rc=$?
  log "DONE  $name rc=$rc"
  tail -3 "$LOGDIR/$name.out" >>"$LOGDIR/session.log" 2>/dev/null
  return $rc
}

# 1. The one deliverable round 1 owed: a fresh on-chip bench number.
BENCH_DEADLINE_S=1100 run_step bench 1200 python bench.py

# 2. On-chip kernel validation re-run (ROADMAP-1 item 11).
run_step validate_kernels 1500 python tools/validate_tpu_kernels.py

# 3. Batch-64 anomaly A/B with traces (VERDICT weak #5).
run_step ab_batch64 1200 python tools/ab_batch64.py

# 4. Batched decode megakernel A/B (VERDICT weak #3).
run_step ab_decode_batched 1500 python tools/ab_decode_batched.py

# 5. On-device preprocess mel A/B (VERDICT weak #4).
run_step ab_preprocess_mel 1200 python tools/ab_preprocess_mel.py 256

# 6. Headline convergence artifact on-chip (VERDICT missing #1 / weak #2).
#    Reuses the already-preprocessed 1024-clip corpus; separate exp dir so
#    the CPU hedge run keeps its own.
if [ -d /tmp/conv_r2/prep ]; then
  run_step convergence_tpu 14400 python -m transformertts_tpu.cli train \
    --set path.data=/tmp/conv_r2/LJSpeech-1.1 \
    --set path.preprocessed=/tmp/conv_r2/prep \
    --set path.experiment=/tmp/conv_r2/exp \
    --set training.num_epochs=150 --set training.warmup_steps=1000 \
    --set training.log_interval=8 \
    --set loss.guided_attn_weight=10.0 \
    --exp-dir /tmp/conv_r2/exp/convergence_r2_tpu
fi

log "queue complete"
