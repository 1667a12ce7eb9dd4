"""Summarize a jax.profiler trace: device time by op category.

Usage:
    python tools/trace_summary.py /tmp/jaxtrace [--steps N] [--top K]

Reads the newest ``*.trace.json.gz`` under the given trace directory and
prints total device time per op-name category, divided by ``--steps`` (the
number of identical steps captured inside the trace window) so rows read
as ms/step.  Used throughout PERF.md's tuning sessions.
"""

from __future__ import annotations

import pathlib as _pl, sys as _sys
_sys.path.insert(0, str(_pl.Path(__file__).resolve().parent.parent))

import argparse
import collections
import glob
import gzip
import json
import re


CATEGORIES = (
    ("self_attn_kernel", lambda n: "self_attn._attend" in n),
    ("cross_attn_kernel", lambda n: "cross_attn._attend" in n),
    ("decode_step_kernel", lambda n: n.startswith("body")),
    ("fused_ln_kernel", lambda n: bool(re.match(r"layer_\d", n))),
    ("conv", lambda n: "conv" in n.lower()),
    ("copy/transpose", lambda n: "copy" in n or "transpose" in n),
    ("dynamic_update_slice", lambda n: "dynamic_update_slice" in n or "dynamic-update" in n),
    ("rng", lambda n: "rng" in n),
    ("xla_fusion_misc", lambda n: "fusion" in n),
)


def summarize(trace_dir: str, steps: int = 1, top: int = 20):
    files = sorted(glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True))
    if not files:
        raise SystemExit(f"no trace files under {trace_dir}")
    with gzip.open(files[-1]) as fh:
        tr = json.load(fh)
    ev = tr["traceEvents"]
    pids = {
        e["pid"]: e["args"].get("name", "")
        for e in ev
        if e.get("ph") == "M" and e.get("name") == "process_name"
    }
    tpu_pids = {p for p, n in pids.items() if "TPU" in n}
    cat = collections.Counter()
    containers = 0.0
    for e in ev:
        if e.get("ph") != "X" or e["pid"] not in tpu_pids:
            continue
        n = e["name"]
        if n.startswith("jit_") or n.startswith("while") or re.fullmatch(r"\d+", n):
            containers = max(containers, e.get("dur", 0))
            continue
        for tag, match in CATEGORIES:
            if match(n):
                cat[tag] += e.get("dur", 0)
                break
        else:
            cat["other:" + re.sub(r"\.\d+$", "", n)[:32]] += e.get("dur", 0)
    total = sum(cat.values())
    print(f"trace: {files[-1]}")
    print(f"accounted device time: {total / steps / 1e3:.3f} ms/step "
          f"(outer container {containers / steps / 1e3:.3f} ms/step)")
    for tag, dur in cat.most_common(top):
        print(f"{dur / steps / 1e3:9.3f} ms/step  {tag}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("trace_dir")
    ap.add_argument("--steps", type=int, default=1)
    ap.add_argument("--top", type=int, default=20)
    a = ap.parse_args()
    summarize(a.trace_dir, a.steps, a.top)
