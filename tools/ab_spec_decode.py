"""On-chip A/B: speculative chunk-verify decode vs the sequential paths.

Decodes the val set at B=1 (the single-stream latency path the feature
targets) through
  - the XLA per-step loop (the baseline the speculative loop extends),
  - the batch-1 decode megakernel (the current latency champion),
  - the speculative loop over a (k, tau) grid,
and reports, per variant: wall-clock s/item and frames/s (host-readback
timed — the relay acks dispatches early, so only device_get is a real
sync), the measured draft acceptance rate (decoded groups per verify
pass), and quality vs ground truth (free MCD-DTW + len ratio).  The
speculative outputs are approximate (accepted drafts are bounded input
perturbations, see infer/decode.py:_speculative_decode), so quality
parity here is the gate for ever changing defaults.

Usage (on the TPU host):
    python tools/ab_spec_decode.py PREP_DIR CKPT_DIR \
        [--set k=v ...] [--n 8] [--grid 4:0.1,4:0.2,8:0.2] \
        [--out ab_spec_decode.json]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("prep_dir")
    ap.add_argument("ckpt_dir")
    ap.add_argument("--set", action="append", default=[], dest="overrides")
    ap.add_argument("--config", default=None)
    ap.add_argument("--n", type=int, default=8)
    ap.add_argument("--step", type=int, default=None)
    ap.add_argument("--grid", default="4:0.1,4:0.2,4:0.4,8:0.2")
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

    def pack(item):
        phoneme = np.zeros((1, t_phon), np.int32)
        seq = item["sequence"][:t_phon]
        phoneme[0, : len(seq)] = seq
        return phoneme, np.array([len(seq)], np.int32)

    r = cfg.model.reduction_factor

    def spec_cfg(k, tau, draft="linear"):
        return cfg.replace(runtime=dataclasses.replace(
            cfg.runtime, decode_speculative_k=k, decode_speculative_tau=tau,
            decode_speculative_draft=draft,
        ))

    # Baselines must NOT inherit a --set runtime.decode_speculative_* probe:
    # the megakernel variant would refuse to build and the "xla_loop"
    # baseline would silently run speculatively, voiding the A/B.
    base_cfg = spec_cfg(0, cfg.runtime.decode_speculative_tau)
    variants = [
        ("xla_loop", make_decode_fn(model, base_cfg, use_megakernel=False)),
        ("megakernel", make_decode_fn(model, base_cfg, use_megakernel=True)),
    ]
    for part in args.grid.split(","):
        bits = part.split(":")
        k_s, tau_s = bits[0], bits[1]
        draft = bits[2] if len(bits) > 2 else "linear"
        variants.append((
            f"spec_k{k_s}_tau{tau_s}" + (f"_{draft}" if draft != "linear" else ""),
            make_decode_fn(model, spec_cfg(int(k_s), float(tau_s), draft)),
        ))

    results = {"ckpt": str(args.ckpt_dir), "epoch": epoch, "n": n,
               "backend": jax.default_backend(), "variants": {}}
    for name, fn in variants:
        # warm (compile) on item 0, then time a full pass
        p0, l0 = pack(items[0])
        jax.device_get(fn(variables, p0, l0))
        tot_s, tot_frames, tot_groups, tot_passes = 0.0, 0, 0, 0
        mcds, lens = [], []
        for item in items:
            phoneme, lens_in = pack(item)
            t0 = time.perf_counter()
            out = jax.device_get(fn(variables, phoneme, lens_in))
            tot_s += time.perf_counter() - t0
            lf = max(int(out["n_frames_per_row"][0]), 1)
            tot_frames += lf
            if "n_verify_passes" in out:
                tot_groups += int(out["n_frames"]) // r
                tot_passes += int(out["n_verify_passes"])
            true = item["melspec"]
            mcds.append(mcd_dtw(out["post_melspec"][0, :lf], true))
            lens.append(lf / max(true.shape[0], 1))
        row = {
            "s_per_item": tot_s / n,
            "frames_per_s": tot_frames / tot_s,
            "mcd_dtw": float(np.mean(mcds)),
            "len_ratio": float(np.mean(lens)),
        }
        if tot_passes:
            row["accept_rate"] = tot_groups / tot_passes
        results["variants"][name] = row
        print(json.dumps({"variant": name, **row}), flush=True)

    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
