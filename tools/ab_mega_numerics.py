"""On-chip numerics A/B: batched decode megakernel vs the XLA loop.

Round-3 raised the megakernel auto-gate to B=8 on timing + interpret-mode
equivalence; this pins the missing evidence (VERDICT r3 weak #2): decode a
TRAINED checkpoint's val items at B in {1,2,4,8} through BOTH paths on real
hardware and report, per batch size,
- mel max-abs-diff and mean-abs-diff between the two paths over the frames
  both produced (post-postnet, the serving output);
- each path's free MCD-DTW vs ground truth + len_ratio (does any numeric
  delta change *quality*?);
- per-item predicted lengths (do stop decisions ever diverge?).

Usage (on the TPU host):
    python tools/ab_mega_numerics.py PREP_DIR CKPT_DIR \
        [--set k=v ...] [--n 16] [--out ab_mega_numerics.json]

The megakernel path replaces the reference's cacheless decode loop
(/root/reference/model/model.py:323-394); quality must match it, not just
race it — the gate stays at 8 only if deltas are bf16-class.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("prep_dir")
    ap.add_argument("ckpt_dir")
    ap.add_argument("--set", action="append", default=[], dest="overrides")
    ap.add_argument("--config", default=None)
    ap.add_argument("--n", type=int, default=16)
    ap.add_argument("--step", type=int, default=None)
    ap.add_argument("--batches", default="1,2,4,8")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import os

    import jax

    want = os.environ.get("JAX_PLATFORMS")
    if want:
        jax.config.update("jax_platforms", want)

    from transformertts_tpu.config import load_config
    from transformertts_tpu.data.dataset import LJSpeechDataset
    from transformertts_tpu.infer.decode import make_decode_fn
    from transformertts_tpu.models import TransformerTTS
    from transformertts_tpu.train.checkpoint import CheckpointManager
    from transformertts_tpu.train.metrics import mcd_dtw
    from transformertts_tpu.train.train_step import create_train_state

    overrides = list(args.overrides) + [f"path.preprocessed={args.prep_dir}"]
    cfg = load_config(args.config, overrides)
    dtype = (
        jax.numpy.bfloat16
        if cfg.runtime.compute_dtype == "bfloat16"
        else jax.numpy.float32
    )
    model = TransformerTTS(cfg.model, dtype=dtype)
    example = {
        "phoneme": np.zeros((1, 1, 16), np.int32),
        "melspec": np.zeros((1, 1, 32, cfg.model.n_mels), np.float32),
        "phoneme_lens": np.full((1, 1), 16, np.int32),
        "melspec_lens": np.full((1, 1), 32, np.int32),
    }
    state = create_train_state(model, cfg, jax.random.PRNGKey(0), example)
    state, epoch = CheckpointManager(args.ckpt_dir).restore(state, step=args.step)
    if state is None:
        raise FileNotFoundError(f"no checkpoint in {args.ckpt_dir}")
    variables = {"params": state.eval_params, "batch_stats": state.batch_stats}

    ds = LJSpeechDataset(cfg.path.preprocessed, "val")
    n = min(args.n, len(ds))
    items = [ds[i] for i in range(n)]
    t_phon = cfg.runtime.phoneme_buckets[-1]

    def pack(batch_items):
        b = len(batch_items)
        phoneme = np.zeros((b, t_phon), np.int32)
        lens = np.zeros((b,), np.int32)
        for i, item in enumerate(batch_items):
            seq = item["sequence"][:t_phon]
            phoneme[i, : len(seq)] = seq
            lens[i] = len(seq)
        return phoneme, lens

    results = {"ckpt": str(args.ckpt_dir), "epoch": epoch, "n": n,
               "backend": jax.default_backend(), "per_batch": {}}
    for bsz in [int(x) for x in args.batches.split(",")]:
        dec_mega = make_decode_fn(model, cfg, use_megakernel=True)
        dec_xla = make_decode_fn(model, cfg, use_megakernel=False)
        max_abs, mean_abs, len_div = [], [], []
        q = {"mega": {"mcd_dtw": [], "len_ratio": []},
             "xla": {"mcd_dtw": [], "len_ratio": []}}
        for lo in range(0, n - n % bsz, bsz):
            chunk = items[lo: lo + bsz]
            phoneme, lens = pack(chunk)
            om = jax.device_get(dec_mega(variables, phoneme, lens))
            ox = jax.device_get(dec_xla(variables, phoneme, lens))
            for i, item in enumerate(chunk):
                lm = max(int(om["n_frames_per_row"][i]), 1)
                lx = max(int(ox["n_frames_per_row"][i]), 1)
                common = min(lm, lx)
                d = np.abs(om["post_melspec"][i, :common].astype(np.float64)
                           - ox["post_melspec"][i, :common].astype(np.float64))
                max_abs.append(float(d.max()))
                mean_abs.append(float(d.mean()))
                len_div.append(int(lm != lx))
                true = item["melspec"]
                q["mega"]["mcd_dtw"].append(mcd_dtw(om["post_melspec"][i, :lm], true))
                q["xla"]["mcd_dtw"].append(mcd_dtw(ox["post_melspec"][i, :lx], true))
                q["mega"]["len_ratio"].append(lm / max(true.shape[0], 1))
                q["xla"]["len_ratio"].append(lx / max(true.shape[0], 1))
        row = {
            "items": len(max_abs),
            "mel_max_abs_diff": float(np.max(max_abs)),
            "mel_mean_abs_diff": float(np.mean(mean_abs)),
            "len_divergences": int(np.sum(len_div)),
            "mega_mcd_dtw": float(np.mean(q["mega"]["mcd_dtw"])),
            "xla_mcd_dtw": float(np.mean(q["xla"]["mcd_dtw"])),
            "mega_len_ratio": float(np.mean(q["mega"]["len_ratio"])),
            "xla_len_ratio": float(np.mean(q["xla"]["len_ratio"])),
        }
        results["per_batch"][str(bsz)] = row
        print(json.dumps({"batch": bsz, **row}), flush=True)

    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)
    print(json.dumps({k: v for k, v in results.items() if k != "per_batch"}))


if __name__ == "__main__":
    main()
