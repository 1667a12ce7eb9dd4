"""Same-session A/B of attention variants on the real chip.

Times the full k=4 scheduled-sampling optimizer step (bench shapes) for:
flash kernel at block_q 256 / 384 / 768, and the XLA attention path.
One process == one tunnel session, so deltas are meaningful.
"""

from __future__ import annotations

import pathlib as _pl, sys as _sys
_sys.path.insert(0, str(_pl.Path(__file__).resolve().parent.parent))

import json
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp


def _time(fn, args, n=30, windows=3):
    out = None
    for _ in range(8):
        out = fn(*args)
    float(jax.device_get(out))
    best = float("inf")
    for _ in range(windows):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        float(jax.device_get(out))
        best = min(best, (time.perf_counter() - t0) / n)
    return best * 1e3


def main():
    from transformertts_tpu.config import Config, apply_overrides
    from transformertts_tpu.models import TransformerTTS
    from transformertts_tpu.models.factory import runtime_model_kwargs
    from transformertts_tpu.train import create_train_state, make_train_step
    from transformertts_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    base = Config().validate()
    jax.config.update("jax_default_prng_impl", base.runtime.prng_impl)

    B, TM, TP = 16, 768, 128
    rng = np.random.default_rng(0)
    batch = {
        "phoneme": jnp.asarray(rng.integers(1, 80, (4, B, TP)), jnp.int32),
        "melspec": jnp.asarray(
            rng.standard_normal((4, B, TM, 80)) * 0.8, jnp.float32),
        "phoneme_lens": jnp.full((4, B), TP, jnp.int32),
        "melspec_lens": jnp.full((4, B), TM, jnp.int32),
    }
    key = jax.random.PRNGKey(1)
    results = {}

    def measure(tag, cfg):
        model = TransformerTTS(cfg.model, **runtime_model_kwargs(cfg))
        state = create_train_state(
            model, cfg, jax.random.PRNGKey(0),
            jax.tree.map(lambda x: np.asarray(x[:1]), batch))
        step = make_train_step(model, cfg, scheduled_sampling=True, donate=False)
        ms = _time(lambda s, b: step(s, b, 0.8, key)[1]["total"], (state, batch))
        results[tag] = ms
        print(f"{tag:<28} {ms:8.2f} ms", file=sys.stderr)

    for bq in (256, 384, 768):
        os.environ["TTS_FLASH_BLOCK_Q"] = str(bq)
        measure(f"flash_bq{bq}", base)
    os.environ["TTS_FLASH_BLOCK_Q"] = "0"
    measure("xla_attention", apply_overrides(
        base, ["runtime.use_pallas_attention=false"]))
    measure("flash_bq256_again", base)

    dev = jax.devices()[0]
    results["_device"] = f"{dev.platform}:{getattr(dev, 'device_kind', '?')}"
    print(json.dumps(results))


if __name__ == "__main__":
    main()
