"""Hardware A/B of the batched decode megakernel (ROADMAP 10).

For B in {1, 2, 4, 8}: KV-cached decode with use_megakernel=True (the
batched Pallas decode-step kernel, ops/pallas/decode_step.py — round-3
restructure: flattened (L, H, B*T, dh) caches + 2-D block-masked score
matmuls, module size flat in B; the earlier leading-batch-dim dot_general
version unrolled to 5.2 MB of MLIR and the compile service 500'd) vs
False (the XLA per-op loop).  Per-B compile failures are caught and
recorded.  Prints a table + writes ab_decode_batched.json.

Run on the real chip:  python tools/ab_decode_batched.py
"""

from __future__ import annotations

import pathlib as _pl, sys as _sys
_sys.path.insert(0, str(_pl.Path(__file__).resolve().parent.parent))

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
    for b in (1, 2, 4, 8):
        phoneme = rng.integers(1, 80, (b, 128)).astype(np.int32)
        lens = np.full((b,), 96, np.int32)
        row = {}
        for mk in (False, True):
            label = "megakernel" if mk else "xla_loop"
            try:
                # stop_threshold=2.0: force the full max_len frames — an
                # untrained model's stop logits cross the default 0.5
                # threshold at frame 1 (verified), which would reduce the
                # "decode" to one step of pure dispatch overhead
                fn = make_decode_fn(model, cfg, max_len=max_len,
                                    stop_threshold=2.0, use_megakernel=mk)
                out = fn(variables, phoneme, lens)  # compile
                nf = int(jax.device_get(out["n_frames"]))
                assert nf == max_len, f"expected {max_len} frames, got {nf}"
                best = float("inf")
                for _ in range(3):
                    t0 = time.perf_counter()
                    for _ in range(4):
                        out = fn(variables, phoneme, lens)
                    _ = int(jax.device_get(out["n_frames"]))
                    best = min(best, (time.perf_counter() - t0) / 4)
                # untrained model: stop never fires, so frames == max_len
                frames = max_len
                row[label] = {
                    "decode_s": best,
                    "us_per_frame_step": best / frames * 1e6,
                    "audio_s_per_s": frames * b * audio_s_per_frame / best,
                }
            except Exception as e:  # noqa: BLE001
                row[label] = {"error": f"{type(e).__name__}: {str(e)[:300]}"}
                traceback.print_exc(limit=3, file=sys.stderr)
        if "error" not in row.get("megakernel", {}) and "error" not in row.get("xla_loop", {}):
            row["speedup"] = row["xla_loop"]["decode_s"] / row["megakernel"]["decode_s"]
        results[f"B{b}"] = row
        print(f"B={b}:", json.dumps(row), file=sys.stderr)

    with open("ab_decode_batched.json", "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
