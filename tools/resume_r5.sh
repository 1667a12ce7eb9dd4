#!/bin/bash
# Round-5 restart recovery: rebuild /tmp queue state from the repo mirrors
# written by tools/queue_watchdog.sh, then relaunch the TPU queue.
#
# Run this after a machine restart (/tmp wiped).  It:
#   1. restores stage markers  artifacts/.queue_state/markers/ -> /tmp
#   2. invalidates corpus markers whose /tmp corpora are gone, so the queue
#      regenerates them (deterministic: same seeds)
#   3. restores each experiment's latest checkpoint + history so
#      `cli train --exp-dir ...` resumes from the last mirrored step
#   4. relaunches run_r4_queue12.sh (+ queue13) and the watchdog
set -u
cd "$(dirname "$0")/.."
QS=artifacts/.queue_state

# 1. markers
mkdir -p /tmp
cp -f "$QS"/markers/r4b_done_* /tmp/ 2>/dev/null

# 2. corpora: the stage markers say "done" but /tmp was wiped — drop the
# markers so gen_synth_corpus + preprocess rerun (same seeds => same data)
[ -d /tmp/conv_r4_4kv2/prep ] || rm -f /tmp/r4b_done_corpus_4kv2
[ -d /tmp/conv_r4_1k/prep ]   || rm -f /tmp/r4b_done_corpus_1k
# a wiped compile cache also means the early warm bench should rerun
[ -d "$HOME/.cache/tts_tpu_xla" ] || rm -f /tmp/r4b_done_bench_warm

# 3. checkpoints + history: map ckpt_<exp> mirrors back into exp dirs
restore_exp() {
  local name=$1 root=$2
  [ -d "$QS/ckpt_$name" ] || return 0
  local exp="$root/exp/$name"
  mkdir -p "$exp/checkpoints"
  cp -a "$QS/ckpt_$name/." "$exp/checkpoints/" 2>/dev/null
  cp -f "$QS/$name/history.json" "$exp/" 2>/dev/null
  cp -f "$QS/$name/train.log" "$exp/" 2>/dev/null
  echo "restored $name at step $(cat "$QS/$name/ckpt_step.txt" 2>/dev/null || echo '?')"
}
restore_exp flagship_stack /tmp/conv_r4_4kv2
restore_exp d1024_short    /tmp/conv_r4_1k
restore_exp stopgate_ema   /tmp/conv_r4_1k

# 4. relaunch (queue13 gates on the queue12 log line, so keep the log path;
# the round-5 queue gates on queue13 via repo-side mirrored logs)
nohup bash tools/run_r4_queue12.sh > /tmp/r4_queue12.log 2>&1 &
echo "queue12 pid $!"
nohup bash tools/run_r4_queue13.sh > /tmp/r4_queue13.log 2>&1 &
echo "queue13 pid $!"
nohup bash tools/run_r5_queue.sh > /tmp/r5_queue.log 2>&1 &
echo "queue-r5 pid $!"
nohup bash tools/queue_watchdog.sh 300 > /tmp/r5_watchdog.log 2>&1 &
echo "watchdog pid $!"
