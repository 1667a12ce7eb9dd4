"""Decompose the flash-kernel cost on-chip: dropout hash, causal mask,
softmax — standalone kernel timings at decoder shapes (B16 H4 T768 D64).

All variants in one session so deltas are meaningful.
"""

from __future__ import annotations

import pathlib as _pl, sys as _sys
_sys.path.insert(0, str(_pl.Path(__file__).resolve().parent.parent))

import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp


def _time(fn, args, n=50, windows=3):
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


def main():
    from transformertts_tpu.ops.pallas.flash_attention import flash_attention
    from transformertts_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    jax.config.update("jax_default_prng_impl", "rbg")

    B, T, H, D = 16, 768, 4, 64
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, T, H, D)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((B, T, H, D)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((B, T, H, D)), jnp.bfloat16)
    bias = jnp.zeros((B, T), jnp.float32)
    key = jax.random.PRNGKey(0)
    results = {}

    def run(tag, causal, dropout, bwd):
        def f(q, k, v):
            o = flash_attention(q, k, v, bias, causal=causal,
                                dropout=dropout, dropout_rng=key)
            return jnp.sum(o.astype(jnp.float32))

        fn = jax.jit(jax.grad(f) if bwd else f)
        ms = _time(fn, (q, k, v))
        results[tag] = ms
        print(f"{tag:<34} {ms:8.3f} ms", file=sys.stderr)

    run("fwd_plain", False, 0.0, False)
    run("fwd_causal", True, 0.0, False)
    run("fwd_causal_drop", True, 0.1, False)
    run("fwdbwd_plain", False, 0.0, True)
    run("fwdbwd_causal", True, 0.0, True)
    run("fwdbwd_causal_drop", True, 0.1, True)

    dev = jax.devices()[0]
    results["_device"] = f"{dev.platform}:{getattr(dev, 'device_kind', '?')}"
    print(json.dumps(results))


if __name__ == "__main__":
    main()
