#!/bin/bash
# Round-4 TPU job queue: serializes the on-chip training runs so one
# detached process owns the (single) chip for the whole sequence.
# Each job writes /tmp/r4_<name>.log and drops /tmp/r4_done_<name> on
# success, so a relaunched queue skips completed work.
#
# Order (VERDICT r3 "next round" numbering):
#   1. flagship_4k  — #1 the data lever on the free-running gap (~2.8 h)
#   2. anneal       — #2 guided-attn form-then-release ablation (~1.7 h)
#   3. stopgate     — #5 tolerant stop-gate training lever (~1.1 h)
set -u
cd "$(dirname "$0")/.."

run() {
  local name=$1; shift
  local marker=/tmp/r4_done_${name}
  if [ -f "$marker" ]; then
    echo "[queue] skip $name (marker exists)"
    return 0
  fi
  echo "[queue] start $name $(date -u +%FT%TZ)"
  "$@" > /tmp/r4_${name}.log 2>&1
  local rc=$?
  echo "[queue] exit  $name rc=$rc $(date -u +%FT%TZ)"
  if [ $rc -eq 0 ]; then touch "$marker"; fi
  return 0
}

run flagship_4k bash tools/run_flagship_4k.sh
run anneal      bash tools/run_anneal_ablation.sh
run stopgate    bash tools/run_stopgate.sh
echo "[queue] all jobs processed $(date -u +%FT%TZ)"
