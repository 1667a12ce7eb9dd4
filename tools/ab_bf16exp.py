"""Same-session A/B: fp32 vs bf16 exp inside the flash kernel, plus a
numerical-agreement check between the two variants."""

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
    from transformertts_tpu.config import Config
    from transformertts_tpu.models import TransformerTTS
    from transformertts_tpu.models.factory import runtime_model_kwargs
    from transformertts_tpu.ops.pallas.flash_attention import flash_attention
    from transformertts_tpu.train import create_train_state, make_train_step
    from transformertts_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    cfg = Config().validate()
    jax.config.update("jax_default_prng_impl", cfg.runtime.prng_impl)
    model = TransformerTTS(cfg.model, **runtime_model_kwargs(cfg))

    B, TM, TP = 16, 768, 128
    rng = np.random.default_rng(0)
    batch = {
        "phoneme": jnp.asarray(rng.integers(1, 80, (4, B, TP)), jnp.int32),
        "melspec": jnp.asarray(
            rng.standard_normal((4, B, TM, 80)) * 0.8, jnp.float32),
        "phoneme_lens": jnp.full((4, B), TP, jnp.int32),
        "melspec_lens": jnp.full((4, B), TM, jnp.int32),
    }
    state = create_train_state(
        model, cfg, jax.random.PRNGKey(0),
        jax.tree.map(lambda x: np.asarray(x[:1]), batch))
    key = jax.random.PRNGKey(1)
    results = {}

    def measure(tag):
        step = make_train_step(model, cfg, scheduled_sampling=True, donate=False)
        ms = _time(lambda s, b: step(s, b, 0.8, key)[1]["total"], (state, batch))
        results[tag] = ms
        print(f"{tag:<22} {ms:8.2f} ms", file=sys.stderr)

    # numerical agreement on a standalone attention (no dropout)
    q = jnp.asarray(rng.standard_normal((4, 256, 4, 64)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((4, 256, 4, 64)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((4, 256, 4, 64)), jnp.bfloat16)
    bias = jnp.zeros((4, 256), jnp.float32)
    os.environ["TTS_FLASH_BF16_EXP"] = "0"
    o32 = np.asarray(jax.jit(
        lambda *a: flash_attention(*a, causal=True))(q, k, v, bias),
        np.float32)
    os.environ["TTS_FLASH_BF16_EXP"] = "1"
    o16 = np.asarray(jax.jit(
        lambda *a: flash_attention(*a, causal=True, dropout=0.0,
                                   dropout_rng=None, interpret=False))(
            q, k, v, bias), np.float32)
    err = float(np.abs(o32 - o16).max())
    results["bf16exp_max_abs_diff"] = err
    print(f"max |fp32exp - bf16exp| = {err:.5f}", file=sys.stderr)

    measure("step_bf16exp")
    os.environ["TTS_FLASH_BF16_EXP"] = "0"
    measure("step_fp32exp")

    dev = jax.devices()[0]
    results["_device"] = f"{dev.platform}:{getattr(dev, 'device_kind', '?')}"
    print(json.dumps(results))


if __name__ == "__main__":
    main()
