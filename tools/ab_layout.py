"""Same-session on-chip A/B: dropout-hash rounds + attention I/O layout.

1. Full k=4 scheduled-sampling step with the 2-round (default) vs 1-round
   counter-hash dropout mask (TTS_DROPOUT_HASH_ROUNDS).
2. Isolated attention-layer micro-bench (fwd+bwd, causal, dropout):
   - "transpose": projections -> (B,T,H,D) -> transpose sandwich around the
     kernel -> merge -> out-proj matmul (the shipped path);
   - "bhtd": projections emitted directly as (B,H,T,D) via einsum, kernel
     consumes them with no transposes, out-projection contracts (h,f)
     straight off the kernel output.
"""

from __future__ import annotations

import pathlib as _pl, sys as _sys
_sys.path.insert(0, str(_pl.Path(__file__).resolve().parent.parent))

import functools
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
    float(jax.device_get(jax.tree.leaves(out)[0].ravel()[0]))
    best = float("inf")
    for _ in range(windows):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        float(jax.device_get(jax.tree.leaves(out)[0].ravel()[0]))
        best = min(best, (time.perf_counter() - t0) / n)
    return best * 1e3


def step_ms(results, tag):
    from transformertts_tpu.config import Config
    from transformertts_tpu.models import TransformerTTS
    from transformertts_tpu.models.factory import runtime_model_kwargs
    from transformertts_tpu.train import create_train_state, make_train_step

    cfg = Config().validate()
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
    step = make_train_step(model, cfg, scheduled_sampling=True, donate=False)
    key = jax.random.PRNGKey(1)
    ms = _time(lambda s, b: step(s, b, 0.8, key)[1]["total"], (state, batch))
    results[tag] = ms
    print(f"{tag:<30} {ms:8.2f} ms", file=sys.stderr)


def layout_bench(results):
    from transformertts_tpu.ops.pallas.flash_attention import _flash, flash_attention

    B, T, H, D = 16, 768, 4, 64
    dm = H * D
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, T, dm)), jnp.bfloat16)
    wq, wk, wv, wo = (
        jnp.asarray(rng.standard_normal((dm, dm)) * 0.06, jnp.bfloat16)
        for _ in range(4))
    seed = jnp.zeros((1,), jnp.int32)
    scale = D ** -0.5
    bias = jnp.zeros((B, T), jnp.float32)

    def attn_transpose(x, wq, wk, wv, wo):
        q = (x @ wq).reshape(B, T, H, D)
        k = (x @ wk).reshape(B, T, H, D)
        v = (x @ wv).reshape(B, T, H, D)
        o = flash_attention(q, k, v, bias, causal=True, dropout=0.1,
                            dropout_rng=jax.random.PRNGKey(0))
        return (o.reshape(B, T, dm) @ wo).astype(jnp.float32)

    def attn_bhtd(x, wq, wk, wv, wo):
        w4 = lambda w: w.reshape(dm, H, D)  # noqa: E731
        q = jnp.einsum("btd,dhf->bhtf", x, w4(wq))
        k = jnp.einsum("btd,dhf->bhtf", x, w4(wk))
        v = jnp.einsum("btd,dhf->bhtf", x, w4(wv))
        o = _flash(q, k, v, bias,
                   jax.random.randint(jax.random.PRNGKey(0), (1,), 0, 2**31 - 1,
                                      jnp.int32),
                   scale, True, 0.1, False)
        return jnp.einsum("bhtf,hfd->btd", o,
                          wo.reshape(H, D, dm)).astype(jnp.float32)

    for name, fn in (("attn_transpose", attn_transpose), ("attn_bhtd", attn_bhtd)):
        loss = lambda *a: jnp.sum(fn(*a))  # noqa: E731
        g = jax.jit(jax.grad(loss, argnums=(0, 1)))
        ms = _time(lambda *a: g(*a)[0], (x, wq, wk, wv, wo))
        results[name] = ms
        print(f"{name:<30} {ms:8.2f} ms", file=sys.stderr)


def main():
    from transformertts_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    from transformertts_tpu.config import Config

    jax.config.update("jax_default_prng_impl",
                      Config().validate().runtime.prng_impl)
    results = {}
    layout_bench(results)
    os.environ["TTS_DROPOUT_HASH_ROUNDS"] = "1"
    step_ms(results, "step_hash1")
    os.environ["TTS_DROPOUT_HASH_ROUNDS"] = "2"
    step_ms(results, "step_hash2")
    dev = jax.devices()[0]
    results["_device"] = f"{dev.platform}:{getattr(dev, 'device_kind', '?')}"
    print(json.dumps(results))


if __name__ == "__main__":
    main()
