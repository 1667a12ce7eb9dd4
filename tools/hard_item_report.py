"""Per-item hard-half amplification report (VERDICT r4 next #6).

Reads a free-running eval JSON written by ``tools/eval_free_running.py
--tf`` (16 val items with both teacher-forced and free-running metrics)
and reports the easy/hard split the round-3/4 analyses tracked: val
items 0-9 are the diverse-register ("hard") half and 10-15 the
template-grammar ("easy") half of the proxy corpus (see
tools/gen_synth_corpus.py); for evals with a different item count the
tool falls back to sorting by teacher-forced MCD and halving.  The
round-4 baseline on ``artifacts/flagship_4k/free_eval_16_tf.json``:
easy half 1.39x, hard half ~2.6x — the number the stacked/extended
runs are probing.

Run:  python tools/hard_item_report.py EVAL_JSON [EVAL_JSON ...]
"""

from __future__ import annotations

import json
import sys


def report(path: str) -> dict:
    d = json.load(open(path))
    items = d["items"]
    # split by corpus identity, matching the round-3/4 analyses: val items
    # 0-9 carry the diverse register (the "hard half"), 10-15 the template
    # grammar ("easy") — see PARITY.md's footnote and the v1/v2 corpus
    # design in tools/gen_synth_corpus.py.  Non-16-item evals don't have
    # that layout: fall back to TF-sorted halves.
    if len(items) == 16:
        hard_sel = list(range(10))
        easy_sel = list(range(10, 16))
    else:
        order = sorted(range(len(items)), key=lambda i: items[i]["tf_mcd"])
        half = max(len(items) // 2, 1)
        easy_sel, hard_sel = order[:half], order[half:] or order[:1]
    out = {"path": path, "n": len(items),
           "free_mcd_dtw": d.get("free_mcd_dtw"),
           "free_len_ratio": d.get("free_len_ratio")}
    print(f"\n== {path} ==")
    print(f"aggregate: free MCD-DTW {d.get('free_mcd_dtw'):.2f}  "
          f"len-ratio {d.get('free_len_ratio'):.2f}  (n={len(items)})")
    print(f"{'idx':>3} {'tf_mcd':>7} {'free_dtw':>8} {'amp':>5} "
          f"{'len_ratio':>9}")
    for name, sel in (("easy", easy_sel), ("hard", hard_sel)):
        tf = [items[i]["tf_mcd"] for i in sel]
        fr = [items[i]["mcd_dtw"] for i in sel]
        amp = sum(f / t for f, t in zip(fr, tf)) / len(sel)
        out[name] = {
            "tf_mcd_range": [min(tf), max(tf)],
            "free_dtw_range": [min(fr), max(fr)],
            "mean_amplification": amp,
        }
        for i in sel:
            it = items[i]
            print(f"{i:>3} {it['tf_mcd']:>7.2f} {it['mcd_dtw']:>8.2f} "
                  f"{it['mcd_dtw'] / it['tf_mcd']:>5.2f} "
                  f"{it['len_ratio']:>9.2f}  [{name}]")
        print(f"  {name} half: TF-MCD {min(tf):.1f}-{max(tf):.1f} -> "
              f"free-DTW {min(fr):.1f}-{max(fr):.1f}  "
              f"(mean amplification {amp:.2f}x)")
    return out


def main():
    args = sys.argv[1:]
    out_path = None
    if "--out" in args:
        i = args.index("--out")
        out_path = args[i + 1]
        del args[i : i + 2]
    results = [report(p) for p in args if not p.startswith("-")]
    if out_path:
        with open(out_path, "w") as f:
            json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
