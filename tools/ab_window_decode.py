"""Hardware A/B of windowed-monotonic decode: XLA loop vs megakernel.

Round 5 made decode_attn_window > 0 (the flagship quality operating
point — free MCD-DTW 5.76 at W=2 on the stacked checkpoint) run on the
Pallas decode-step fast path instead of forcing the XLA per-op loop.
This measures what that recovers on silicon: for B in {1, 8} and
W in {0, 2}, KV-cached decode time with use_megakernel True vs False.
Same-session A/B (one process, shared compile cache), best-of-3 windows
of 4 reps, host readback as the sync point — the methodology of
tools/ab_decode_batched.py.

Run on the real chip:  python tools/ab_window_decode.py [k=v overrides]
Writes ab_window_decode.json.
"""

from __future__ import annotations

import pathlib as _pl, sys as _sys
_sys.path.insert(0, str(_pl.Path(__file__).resolve().parent.parent))

import dataclasses
import json
import sys
import time
import traceback

import numpy as np

import jax


def main():
    from transformertts_tpu.config import Config, apply_overrides
    from transformertts_tpu.infer.decode import make_decode_fn
    from transformertts_tpu.models import TransformerTTS
    from transformertts_tpu.models.factory import runtime_model_kwargs
    from transformertts_tpu.train import create_train_state
    from transformertts_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    cfg = apply_overrides(Config().validate(), sys.argv[1:])
    jax.config.update("jax_default_prng_impl", cfg.runtime.prng_impl)
    max_len = 512
    rng = np.random.default_rng(0)

    model = TransformerTTS(cfg.model, **runtime_model_kwargs(cfg))
    tiny = {
        "phoneme": rng.integers(1, 80, (1, 2, 16)).astype(np.int32),
        "melspec": rng.standard_normal((1, 2, 32, cfg.model.n_mels)).astype(np.float32),
        "phoneme_lens": np.full((1, 2), 16, np.int32),
        "melspec_lens": np.full((1, 2), 32, np.int32),
    }
    state = create_train_state(model, cfg, jax.random.PRNGKey(0), tiny)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    audio_s_per_frame = cfg.audio.hop_length / cfg.audio.sample_rate

    results = {}
    for b in (1, 8):
        phoneme = rng.integers(1, 80, (b, 128)).astype(np.int32)
        lens = np.full((b,), 96, np.int32)
        for win in (0, 2):
            cfg_w = cfg.replace(
                runtime=dataclasses.replace(
                    cfg.runtime, decode_attn_window=win
                )
            )
            row = {}
            for mk in (False, True):
                label = "megakernel" if mk else "xla_loop"
                try:
                    # stop_threshold=2.0: force full max_len frames (an
                    # untrained model's stop fires at frame 1 otherwise)
                    fn = make_decode_fn(model, cfg_w, max_len=max_len,
                                        stop_threshold=2.0, use_megakernel=mk)
                    out = fn(variables, phoneme, lens)  # compile
                    nf = int(jax.device_get(out["n_frames"]))
                    assert nf == max_len, f"expected {max_len}, got {nf}"
                    best = float("inf")
                    for _ in range(3):
                        t0 = time.perf_counter()
                        for _ in range(4):
                            out = fn(variables, phoneme, lens)
                        _ = int(jax.device_get(out["n_frames"]))
                        best = min(best, (time.perf_counter() - t0) / 4)
                    row[label] = {
                        "decode_s": best,
                        "us_per_frame_step": best / max_len * 1e6,
                        "audio_s_per_s": max_len * b * audio_s_per_frame / best,
                    }
                except Exception as e:  # noqa: BLE001
                    row[label] = {"error": f"{type(e).__name__}: {str(e)[:300]}"}
                    traceback.print_exc(limit=3, file=sys.stderr)
            if all("error" not in row.get(k, {}) for k in ("megakernel", "xla_loop")):
                row["speedup"] = (
                    row["xla_loop"]["decode_s"] / row["megakernel"]["decode_s"]
                )
            results[f"B{b}_W{win}"] = row
            print(f"B={b} W={win}:", json.dumps(row), file=sys.stderr)

    with open("ab_window_decode.json", "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
