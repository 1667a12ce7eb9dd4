"""Render a training history.json as convergence-curve small multiples.

Usage: python tools/plot_history.py EXP_DIR/history.json [out.png]

Design notes (dataviz method): small multiples over a shared epoch axis —
never dual axes; at most two series per panel, colored by the validated
default categorical order (slot 1 blue #2a78d6, slot 2 orange #eb6834 —
the documented adjacent-pair-safe order; the palette validator needs node,
absent in this image, so the documented pre-validated defaults are used
verbatim); direct labels at line ends instead of per-point numbers; text
in neutral ink; recessive grid.
"""

from __future__ import annotations

import pathlib as _pl, sys as _sys
_sys.path.insert(0, str(_pl.Path(__file__).resolve().parent.parent))

import json
import pathlib
import sys

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

BLUE, ORANGE = "#2a78d6", "#eb6834"
INK, MUTED = "#333333", "#8a8a8a"

# panel title, [(history key, direct label, color)]
PANELS = [
    ("loss", [("total", "train", BLUE), ("val_loss", "val", ORANGE)]),
    ("mel L1", [("val_mel_l1", "teacher-forced", BLUE),
                ("val_free_mel_l1", "free-running", ORANGE)]),
    ("alignment diagonality", [("val_diagonality", "val", BLUE)]),
    ("stop token", [("val_stop_accuracy", "accuracy", BLUE),
                    ("val_stop_recall", "recall", ORANGE)]),
    ("MCD (dB)", [("val_mcd", "teacher-forced", BLUE),
                  ("val_free_mcd", "free-running", ORANGE)]),
    ("free-running length ratio", [("val_free_len_ratio", "pred/true", BLUE)]),
]


def main() -> None:
    hist_path = pathlib.Path(sys.argv[1])
    out = pathlib.Path(sys.argv[2]) if len(sys.argv) > 2 else hist_path.with_name("curves.png")
    hist = json.loads(hist_path.read_text())
    epochs = [h["epoch"] for h in hist]

    fig, axes = plt.subplots(2, 3, figsize=(13, 6.5), dpi=150)
    fig.patch.set_facecolor("white")
    for ax, (title, series) in zip(axes.ravel(), PANELS):
        drawn = 0
        ends = []
        for key, label, color in series:
            ys = [h.get(key) for h in hist]
            if all(v is None for v in ys):
                continue
            xs = [e for e, v in zip(epochs, ys) if v is not None]
            vs = [v for v in ys if v is not None]
            ax.plot(xs, vs, color=color, linewidth=1.6)
            ends.append((xs[-1], vs[-1], label))
            drawn += 1
        # direct labels at line ends; nudge apart when endpoints collide
        if ends:
            lo = min(v for _, v, _ in ends)
            hi = max(v for _, v, _ in ends)
            span = max(hi - lo, 1e-9)
            for i, (x, v, label) in enumerate(sorted(ends, key=lambda t: t[1])):
                dy = 0.0
                if len(ends) > 1 and span < 0.08 * max(abs(hi), 1e-9) + 1e-12:
                    dy = (i - (len(ends) - 1) / 2) * 9  # points
                ax.annotate(label, (x, v), xytext=(4, dy),
                            textcoords="offset points", fontsize=7, color=INK,
                            va="center")
        ax.set_title(title, fontsize=9, color=INK, loc="left")
        ax.grid(True, color="#e8e8e8", linewidth=0.6)
        ax.tick_params(labelsize=7, colors=MUTED)
        for s in ("top", "right"):
            ax.spines[s].set_visible(False)
        for s in ("left", "bottom"):
            ax.spines[s].set_color(MUTED)
        ax.set_xlabel("epoch", fontsize=7, color=MUTED)
        ax.margins(x=0.02)
        if not drawn:
            ax.text(0.5, 0.5, "no data", transform=ax.transAxes,
                    ha="center", fontsize=8, color=MUTED)
    fig.tight_layout()
    fig.savefig(out, bbox_inches="tight")
    print("wrote", out)


if __name__ == "__main__":
    main()
