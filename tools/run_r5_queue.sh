#!/bin/bash
# Round-5 TPU job queue: post-recovery measurements.
#
# Gates on the round-4 recovery queues (queue12 + queue13) finishing, then
# runs the round-5 additions:
#   1. W-sweep free-running evals on the EXTENDED (200-epoch) stacked
#      checkpoint (CPU — repeats the round-5 100-epoch sweep that found
#      W=2 => free MCD-DTW 5.76 at len 1.02)
#   2. on-chip A/B of windowed decode: XLA loop vs megakernel fast path
#      (tools/ab_window_decode.py — round 5 moved decode_attn_window onto
#      the Pallas kernels)
#   3. serving bench at the flagship operating point (stacked ckpt,
#      decode_attn_window=2, warmed buckets)
#   4. fresh driver bench (keeps bench_last_good + compile cache warm)
#
# Unlike the round-4 queues, stage markers live IN THE REPO
# (artifacts/.queue_state/markers/r5_done_*): a /tmp wipe does not lose
# queue position, and a rerun of this script resumes from the repo-side
# markers directly — no restore step needed (tools/resume_r5.sh still
# rebuilds corpora/checkpoints for the stages that read them).
set -u
cd "$(dirname "$0")/.."
MARK=artifacts/.queue_state/markers
mkdir -p "$MARK"

run() {
  local name=$1; shift
  local marker=$MARK/r5_done_${name}
  if [ -f "$marker" ]; then
    echo "[queue-r5] skip $name (marker exists)"
    return 0
  fi
  echo "[queue-r5] start $name $(date -u +%FT%TZ)"
  "$@" > /tmp/r5_${name}.log 2>&1
  local rc=$?
  echo "[queue-r5] exit  $name rc=$rc $(date -u +%FT%TZ)"
  if [ $rc -eq 0 ]; then touch "$marker"; fi
  return 0
}

# gate: both recovery queues done (their logs are mirrored into the repo
# by the watchdog, so check both locations)
gate() {
  local pat=$1
  grep -q "$pat" /tmp/r4_queue12.log /tmp/r4_queue13.log \
    artifacts/.queue_state/logs/r4_queue12.log \
    artifacts/.queue_state/logs/r4_queue13.log 2>/dev/null
}
until gate "\[queue13\] all jobs processed"; do
  sleep 60
done

V2=/tmp/conv_r4_4kv2
K1=/tmp/conv_r4_1k

# --- 2. on-chip windowed megakernel A/B (latency) ---
run ab_window timeout 3600 python tools/ab_window_decode.py

# --- 2b. on-chip windowed megakernel numerics on the stacked checkpoint
# (quality parity of the W=2 kernel fast path vs the CPU sweep numbers) ---
run ab_mega_w2 timeout 3600 python tools/ab_mega_numerics.py \
  $V2/prep $V2/exp/flagship_stack/checkpoints \
  --set runtime.decode_attn_window=2 \
  --out ab_mega_numerics_w2.json

# --- 0. d1024 completion: the queue12 stage ran under a 4800 s timeout
# that its ~4.5 min/epoch pace may exceed; the CLI resumes from the last
# checkpoint, so this just finishes any remaining epochs + repackages ---
run d1024_finish timeout 3600 python -m transformertts_tpu.cli train \
  --config configs/large_tp.yaml \
  --set runtime.mesh_model=1 \
  --set path.data=$K1/LJSpeech-1.1 --set path.preprocessed=$K1/prep \
  --set path.experiment=$K1/exp \
  --set training.num_epochs=20 --set training.warmup_steps=300 \
  --set training.log_interval=8 \
  --set loss.guided_attn_weight=10.0 \
  --exp-dir $K1/exp/d1024_short
run d1024_repackage timeout 600 bash tools/package_convergence.sh \
  $K1/exp/d1024_short artifacts/d1024_short

# --- 1. W-sweep on the 200-epoch stacked checkpoint (CPU) ---
for W in 0 2 3 4; do
  run wsweep200_w$W timeout 1800 env JAX_PLATFORMS=cpu python tools/eval_free_running.py \
    $V2/prep $V2/exp/flagship_stack/checkpoints \
    --set runtime.decode_attn_window=$W \
    --tf --out artifacts/flagship_stack/free_eval_200ep_w$W.json
done

# --- 3. serving bench at the flagship operating point ---
run bench_serving_flagship timeout 2400 python tools/bench_serving.py \
  $V2/prep $V2/exp/flagship_stack/checkpoints \
  --set path.data=$V2/LJSpeech-1.1 \
  --set runtime.decode_attn_window=2 \
  --conc 1,4,8 --reqs 4 --out bench_serving_flagship.json

# --- 4. fresh driver bench ---
run bench_r5_final env BENCH_DEADLINE_S=1200 timeout 1500 python bench.py

echo "[queue-r5] all jobs processed $(date -u +%FT%TZ)"
