"""Sweep runtime.decode_attn_window on a trained checkpoint.

The windowed-monotonic decode's optimal W is per-checkpoint state (see
configs/flagship.yaml and DESIGN.md 4e): on the round-5 stacked
checkpoint the sweep minimum was W=2 (free MCD-DTW 5.76 at len 1.02),
while on round-4 checkpoints with softer attention W=2 was the worst
setting.  This runs the sweep protocol in one command — N settings of
tools/eval_free_running.py on the same checkpoint — and prints the
frontier table plus the argmin.

Run:  python tools/sweep_window.py PREP_DIR CKPT_DIR \
        [--windows 0,2,3,4,8] [--n 16] [--out sweep.json] [--set k=v ...]
"""

from __future__ import annotations

import argparse
import json
import pathlib
import subprocess
import sys
import tempfile

REPO = pathlib.Path(__file__).resolve().parent.parent


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("prep_dir")
    ap.add_argument("ckpt_dir")
    ap.add_argument("--windows", default="0,2,3,4,8")
    ap.add_argument("--n", type=int, default=16)
    ap.add_argument("--set", action="append", default=[], dest="overrides")
    ap.add_argument("--config", default=None)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    rows = []
    for w in [int(x) for x in args.windows.split(",")]:
        with tempfile.NamedTemporaryFile(suffix=".json", delete=False) as f:
            tmp = f.name
        cmd = [
            sys.executable, str(REPO / "tools" / "eval_free_running.py"),
            args.prep_dir, args.ckpt_dir,
            "--set", f"runtime.decode_attn_window={w}",
            "--n", str(args.n), "--tf", "--out", tmp,
        ]
        if args.config:
            cmd += ["--config", args.config]
        for ov in args.overrides:
            cmd += ["--set", ov]
        r = subprocess.run(cmd, capture_output=True, text=True)
        if r.returncode != 0:
            print(f"W={w}: eval failed rc={r.returncode}\n{r.stderr[-500:]}",
                  file=sys.stderr)
            continue
        d = json.load(open(tmp))
        rows.append({"window": w, "free_mcd_dtw": d["free_mcd_dtw"],
                     "free_len_ratio": d["free_len_ratio"],
                     "free_mel_l1": d["free_mel_l1"]})
        print(f"W={w}: free MCD-DTW {d['free_mcd_dtw']:.2f}  "
              f"len {d['free_len_ratio']:.2f}")
    if not rows:
        sys.exit("no successful evals")
    best = min(rows, key=lambda r: r["free_mcd_dtw"])
    print(f"\nbest: W={best['window']} "
          f"(free MCD-DTW {best['free_mcd_dtw']:.2f} at "
          f"len {best['free_len_ratio']:.2f})")
    if args.out:
        with open(args.out, "w") as f:
            json.dump({"rows": rows, "best": best}, f, indent=1)


if __name__ == "__main__":
    main()
