#!/bin/bash
# Package a parity-config TPU convergence run into artifacts/<name>/ for
# the judge: history.json + convergence curves + the latest alignment
# grid + a summary printed for the README (numbers filled by the
# committer).
#
# Usage: bash tools/package_convergence.sh [EXP_DIR] [OUT_DIR]
set -eu
cd "$(dirname "$0")/.."
EXP=${1:-/tmp/conv_r2/exp/convergence_r2_tpu}
[ -d "$EXP" ] || EXP=/tmp/conv_r2/exp/convergence_r2
OUT=${2:-artifacts/convergence_r2_tpu}
mkdir -p "$OUT"
cp "$EXP/history.json" "$OUT/history.json"
python tools/plot_history.py "$EXP/history.json" "$OUT/curves.png"
latest_align=$(ls -t "$EXP"/align_single/*.png 2>/dev/null | head -1)
[ -n "$latest_align" ] && cp "$latest_align" "$OUT/alignment_latest.png"
latest_batch=$(ls -t "$EXP"/align_batch/*.png 2>/dev/null | head -1)
[ -n "$latest_batch" ] && cp "$latest_batch" "$OUT/alignment_batch_latest.png"
latest_mel=$(ls -t "$EXP"/mels_single/*.png 2>/dev/null | head -1)
[ -n "$latest_mel" ] && cp "$latest_mel" "$OUT/mel_single_latest.png"
python - "$OUT/history.json" <<'EOF'
import json, sys
h = json.load(open(sys.argv[1]))
best = min(h, key=lambda e: e["val_loss"])
last = h[-1]
peak_diag = max(e["val_diagonality"] for e in h)
peak_recall = max(e.get("val_stop_recall_2", e["val_stop_recall"]) for e in h)
print(f"epochs: {len(h)}  (last epoch {last['epoch']})")
print(f"val_loss: {h[0]['val_loss']:.3f} -> best {best['val_loss']:.3f} (epoch {best['epoch']})")
print(f"val_mel_l1: {h[0]['val_mel_l1']:.3f} -> {best['val_mel_l1']:.3f}")
print(f"val_diagonality: {h[0]['val_diagonality']:.3f} -> peak {peak_diag:.3f} (last {last['val_diagonality']:.3f})")
print(f"val_stop_recall(+-2): peak {peak_recall:.2f} (last {last.get('val_stop_recall_2', last['val_stop_recall']):.2f})")
print(f"free-running: mel_l1 {best.get('val_free_mel_l1', float('nan')):.3f}  mcd {best.get('val_free_mcd', float('nan')):.2f}  mcd_dtw {best.get('val_free_mcd_dtw', float('nan')):.2f}  len_ratio {best.get('val_free_len_ratio', float('nan')):.2f} (at best-val epoch)")
EOF
echo "packaged into $OUT/"
