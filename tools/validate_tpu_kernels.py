"""On-chip validation of the Pallas kernels' in-kernel PRNG dropout paths.

The CPU test suite skips dropout-mask consistency for the flash-attention
and fused-LN kernels (pltpu.prng_* has no interpret-mode rule); this script
runs those exact checks on the real TPU:

- determinism: same seed -> identical forward twice; different seed differs;
- keep-rate within a statistical band;
- fwd/bwd mask agreement: for the fused-LN kernel, grad wrt h must be zero
  exactly where the forward dropped h (a mismatched backward mask corrupts
  gradients silently otherwise);
- flash attention: gradient finiteness + train-forward reproducibility.

Run: python tools/validate_tpu_kernels.py   (needs the TPU backend)
"""

import numpy as np

import jax
import jax.numpy as jnp

from transformertts_tpu.ops.pallas.flash_attention import flash_attention
from transformertts_tpu.ops.pallas.fused_ln import residual_dropout_layernorm


def check(name, cond, detail=""):
    status = "OK" if cond else "FAIL"
    print(f"{name}: {status} {detail}")
    if not cond:
        raise SystemExit(1)


def validate_fused_ln():
    rng = np.random.default_rng(0)
    shape = (256, 256)
    x = jnp.zeros(shape, jnp.float32)
    h = jnp.asarray(rng.standard_normal(shape), jnp.float32) + 5.0
    gamma = jnp.ones(256, jnp.float32)
    beta = jnp.zeros(256, jnp.float32)
    p = 0.5
    key = jax.random.PRNGKey(0)

    f = lambda h_, k: residual_dropout_layernorm(  # noqa: E731
        x, h_, gamma, beta, dropout=p, dropout_rng=k
    )
    out1 = np.asarray(f(h, key))
    out2 = np.asarray(f(h, key))
    check("fused_ln determinism", np.array_equal(out1, out2))
    out3 = np.asarray(f(h, jax.random.PRNGKey(9)))
    check("fused_ln seed sensitivity", not np.array_equal(out1, out3))

    grads = jax.grad(lambda h_: jnp.sum(f(h_, key)))(h)
    g = np.asarray(grads)
    check("fused_ln grad finite", np.isfinite(g).all())
    frac = (g == 0.0).mean()
    check("fused_ln keep-rate", 0.45 < frac < 0.55, f"dropped={frac:.3f}")

    # fwd/bwd mask agreement: finite-difference in a KEPT coordinate moves
    # the output; in a DROPPED coordinate it must not.
    kept = np.argwhere(g != 0.0)[0]
    dropped = np.argwhere(g == 0.0)[0]
    eps = 0.1
    base = np.asarray(f(h, key))
    bump_kept = np.asarray(f(h.at[tuple(kept)].add(eps), key))
    bump_drop = np.asarray(f(h.at[tuple(dropped)].add(eps), key))
    check("fused_ln fwd/bwd mask (kept moves)", np.abs(bump_kept - base).max() > 0)
    check("fused_ln fwd/bwd mask (dropped inert)", np.abs(bump_drop - base).max() == 0)


def validate_flash():
    rng = np.random.default_rng(1)
    B, T, H, D = 2, 64, 4, 64
    q = jnp.asarray(rng.standard_normal((B, T, H, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, T, H, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, T, H, D)), jnp.float32)
    key = jax.random.PRNGKey(0)

    f = lambda q_, kk: flash_attention(  # noqa: E731
        q_, k, v, None, causal=True, dropout=0.3, dropout_rng=kk
    )
    out1 = np.asarray(f(q, key))
    out2 = np.asarray(f(q, key))
    check("flash dropout determinism", np.array_equal(out1, out2))
    out3 = np.asarray(f(q, jax.random.PRNGKey(7)))
    check("flash seed sensitivity", not np.array_equal(out1, out3))

    g = np.asarray(jax.grad(lambda q_: jnp.sum(f(q_, key) ** 2))(q))
    check("flash dropout grad finite", np.isfinite(g).all())

    # no-dropout parity against the XLA path on-chip
    from transformertts_tpu.models.attention import dot_product_attention
    from transformertts_tpu.models.masks import causal_bias

    ref, _ = dot_product_attention(q, k, v, causal_bias(T))
    out = np.asarray(flash_attention(q, k, v, None, causal=True))
    check("flash on-chip parity", np.abs(out - np.asarray(ref)).max() < 2e-4,
          f"max|diff|={np.abs(out - np.asarray(ref)).max():.2e}")


if __name__ == "__main__":
    dev = jax.devices()[0]
    print(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')}")
    if dev.platform != "tpu":
        raise SystemExit("needs the TPU backend (kernels run compiled, not interpreted)")
    validate_fused_ln()
    validate_flash()
    print("all TPU kernel dropout validations passed")
