"""Free-running decode evaluation from a saved checkpoint.

Decomposes the train/inference gap: for each val item it reports
- mel_l1 / mcd      frame-wise over min(pred_len, true_len) — the numbers
                    the trainer logs per epoch (confound pacing + spectra)
- mcd_dtw           DTW-aligned MCD (train/metrics.py:mcd_dtw) — spectral
                    error net of pacing drift, the standard TTS protocol
- len_ratio         pred_len / true_len

Usage:
    python tools/eval_free_running.py PREP_DIR CKPT_DIR \
        [--set k=v ...] [--n 16] [--step N] [--out eval.json]

The model/runtime config must match the checkpoint (same --set flags the
training run used).  Runs fine on CPU (JAX_PLATFORMS=cpu) — decode of a
handful of utterances at d256 takes ~1 min each.
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
    ap.add_argument("--n", type=int, default=16, help="val items to decode")
    ap.add_argument("--step", type=int, default=None, help="checkpoint step")
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--tf", action="store_true",
                    help="also report per-item TEACHER-FORCED mel_l1/MCD "
                         "(for the free-vs-TF amplification analysis, PARITY.md)")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import os

    import jax

    # honor JAX_PLATFORMS even though sitecustomize pre-imports jax
    want = os.environ.get("JAX_PLATFORMS")
    if want:
        jax.config.update("jax_platforms", want)

    from transformertts_tpu.config import load_config
    from transformertts_tpu.data.dataset import LJSpeechDataset
    from transformertts_tpu.infer.decode import make_decode_fn
    from transformertts_tpu.models import TransformerTTS
    from transformertts_tpu.train.checkpoint import CheckpointManager
    from transformertts_tpu.train.metrics import mcd_dtw, mel_cepstral_distortion
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
    decode = make_decode_fn(model, cfg)
    t_phon = cfg.runtime.phoneme_buckets[-1]

    rows = []
    for lo in range(0, n, args.batch):
        items = [ds[i] for i in range(lo, min(lo + args.batch, n))]
        b = len(items)
        phoneme = np.zeros((b, t_phon), np.int32)
        lens = np.zeros((b,), np.int32)
        for i, item in enumerate(items):
            seq = item["sequence"][:t_phon]
            phoneme[i, : len(seq)] = seq
            lens[i] = len(seq)
        out = jax.device_get(decode(variables, phoneme, lens))
        tf_out = None
        if args.tf:
            # teacher-forced forward over the same padded batch: pad mels to
            # the batch max rounded up to the reduction factor
            r = cfg.model.reduction_factor
            t_max = max(it["melspec"].shape[0] for it in items)
            t_max = ((t_max + r - 1) // r) * r
            mel_in = np.zeros((b, t_max, cfg.model.n_mels), np.float32)
            mel_lens = np.zeros((b,), np.int32)
            for i, it in enumerate(items):
                t = it["melspec"].shape[0]
                mel_in[i, :t] = it["melspec"]
                mel_lens[i] = t
            tf_out = jax.device_get(model.apply(
                variables, phoneme, mel_in, lens, mel_lens,
                train=False, return_alignments=False,
            ))
        for i, item in enumerate(items):
            pred_len = max(int(out["n_frames_per_row"][i]), 1)
            true = item["melspec"]
            m = min(pred_len, true.shape[0])
            pred = out["post_melspec"][i, :m]
            rows.append({
                "mel_l1": float(np.abs(pred - true[:m]).mean()),
                "mcd": float(mel_cepstral_distortion(
                    pred[None], true[None, :m], np.array([m], np.int32))),
                "mcd_dtw": mcd_dtw(out["post_melspec"][i, :pred_len], true),
                "len_ratio": pred_len / max(true.shape[0], 1),
                "pred_len": pred_len,
                "true_len": int(true.shape[0]),
            })
            if tf_out is not None:
                t = true.shape[0]
                tf_pred = tf_out["post_melspec"][i, :t]
                rows[-1]["tf_mel_l1"] = float(np.abs(tf_pred - true).mean())
                rows[-1]["tf_mcd"] = float(mel_cepstral_distortion(
                    tf_pred[None], true[None], np.array([t], np.int32)))
            print(json.dumps({"item": lo + i, **rows[-1]}), flush=True)

    summary = {
        "ckpt": str(args.ckpt_dir),
        "step": args.step,
        "epoch": epoch,
        "n": len(rows),
        "free_mel_l1": float(np.mean([r["mel_l1"] for r in rows])),
        "free_mcd": float(np.mean([r["mcd"] for r in rows])),
        "free_mcd_dtw": float(np.mean([r["mcd_dtw"] for r in rows])),
        "free_len_ratio": float(np.mean([r["len_ratio"] for r in rows])),
        "items": rows,
    }
    if args.tf:
        summary["tf_mel_l1"] = float(np.mean([r["tf_mel_l1"] for r in rows]))
        summary["tf_mcd"] = float(np.mean([r["tf_mcd"] for r in rows]))
    print(json.dumps({k: v for k, v in summary.items() if k != "items"}))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(summary, f, indent=1)


if __name__ == "__main__":
    main()
