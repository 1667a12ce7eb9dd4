#!/bin/bash
# Round-5 restart insurance (VERDICT r4 "next round" item 2).
#
# Round 4 lost its headline because queue markers, corpora, checkpoints and
# eval JSONs all lived in /tmp and a machine restart wiped them.  This
# watchdog runs alongside the TPU queue and, every INTERVAL seconds, mirrors
# the evidence into the repo working tree (which persists across restarts)
# and git-commits the small pieces:
#
#   artifacts/.queue_state/markers/      <- /tmp/r4b_done_* stage markers   (committed)
#   artifacts/.queue_state/logs/         <- queue + per-stage logs          (committed)
#   artifacts/.queue_state/evals/        <- /tmp/free_eval_*.json           (committed)
#   artifacts/.queue_state/<exp>/        <- history.json + train.log        (committed)
#   artifacts/.queue_state/ckpt_<exp>/   <- latest orbax checkpoint mirror  (gitignored:
#                                           85 MB each; the working dir survives the
#                                           observed failure mode — /tmp wipe — and
#                                           committing one per interval would add GBs
#                                           to history.  Final checkpoints are packaged
#                                           and committed at stage boundaries.)
#
# Commits use a pathspec (`git commit -- artifacts/.queue_state`) so they can
# never sweep in unrelated staged work (the round-4 `--help/` lesson).
# A kill -9 + /tmp wipe at any point now loses at most one interval of
# training; tools/resume_r5.sh restores /tmp from these mirrors and
# relaunches the queue.
set -u
cd "$(dirname "$0")/.."
QS=artifacts/.queue_state
INTERVAL=${1:-300}
mkdir -p "$QS/markers" "$QS/logs" "$QS/evals"

snapshot() {
  cp -f /tmp/r4b_done_* "$QS/markers/" 2>/dev/null
  for f in /tmp/r4_queue1[23].log /tmp/r4b_*.log /tmp/r5_*.log; do
    [ -f "$f" ] && cp -f "$f" "$QS/logs/" 2>/dev/null
  done
  cp -f /tmp/free_eval_*.json /tmp/ab_*.json "$QS/evals/" 2>/dev/null
  for exp in /tmp/conv_r4_4kv2/exp/* /tmp/conv_r4_1k/exp/*; do
    [ -d "$exp" ] || continue
    local name; name=$(basename "$exp")
    mkdir -p "$QS/$name"
    cp -f "$exp/history.json" "$QS/$name/" 2>/dev/null
    cp -f "$exp/train.log" "$QS/$name/" 2>/dev/null
    # latest complete orbax step dir (numeric names only; orbax in-progress
    # dirs carry a .orbax-checkpoint-tmp suffix and are skipped)
    local ck
    ck=$(ls "$exp/checkpoints" 2>/dev/null | grep -E '^[0-9]+$' | sort -n | tail -1)
    if [ -n "$ck" ] && [ -d "$exp/checkpoints/$ck" ] && \
       [ ! -d "$QS/ckpt_$name/$ck" ]; then
      # complete orbax step dirs are immutable: copy once, atomically (no
      # rsync in this image), then drop older mirrored steps
      mkdir -p "$QS/ckpt_$name"
      rm -rf "$QS/ckpt_$name/.partial"
      if cp -a "$exp/checkpoints/$ck" "$QS/ckpt_$name/.partial" 2>/dev/null; then
        mv "$QS/ckpt_$name/.partial" "$QS/ckpt_$name/$ck"
        echo "$ck" > "$QS/$name/ckpt_step.txt"
        for old in "$QS/ckpt_$name"/*; do
          [ "$(basename "$old")" != "$ck" ] && rm -rf "$old"
        done
      fi
    fi
  done
}

while true; do
  snapshot
  git add -A "$QS" 2>/dev/null
  if [ -n "$(git status --porcelain "$QS" 2>/dev/null)" ]; then
    git commit -q -m "queue watchdog: evidence snapshot $(date -u +%FT%TZ)" -- "$QS" \
      2>/dev/null || true
  fi
  sleep "$INTERVAL"
done
