"""Fused residual+dropout+LayerNorm kernel parity vs XLA (interpret mode)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from transformertts_tpu.ops.pallas.fused_ln import residual_dropout_layernorm

EPS = 1e-5


def ref_ln(x, h, gamma, beta):
    z = (x + h).astype(jnp.float32)
    mu = z.mean(-1, keepdims=True)
    var = jnp.maximum((z * z).mean(-1, keepdims=True) - mu * mu, 0.0)
    return (z - mu) * jax.lax.rsqrt(var + EPS) * gamma + beta


@pytest.mark.parametrize("shape", [(2, 32, 256), (64, 128), (3, 8, 128)])
def test_forward_parity(shape):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    h = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    d = shape[-1]
    gamma = jnp.asarray(rng.standard_normal(d), jnp.float32)
    beta = jnp.asarray(rng.standard_normal(d), jnp.float32)

    out = residual_dropout_layernorm(x, h, gamma, beta, interpret=True)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref_ln(x, h, gamma, beta)), atol=1e-5
    )


def test_gradient_parity():
    rng = np.random.default_rng(1)
    shape = (4, 16, 128)
    x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    h = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    gamma = jnp.asarray(rng.standard_normal(128), jnp.float32)
    beta = jnp.asarray(rng.standard_normal(128), jnp.float32)
    cot = jnp.asarray(rng.standard_normal(shape), jnp.float32)

    def loss_ref(x, h, g, b):
        return jnp.sum(ref_ln(x, h, g, b) * cot)

    def loss_fused(x, h, g, b):
        return jnp.sum(
            residual_dropout_layernorm(x, h, g, b, interpret=True) * cot
        )

    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(x, h, gamma, beta)
    gf = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(x, h, gamma, beta)
    for a, b_, name in zip(gr, gf, "x h gamma beta".split()):
        np.testing.assert_allclose(
            np.asarray(b_), np.asarray(a), atol=2e-5, err_msg=f"d{name}"
        )


def test_bf16_storage_fp32_stats():
    rng = np.random.default_rng(2)
    shape = (8, 16, 128)
    x = jnp.asarray(rng.standard_normal(shape), jnp.bfloat16)
    h = jnp.asarray(rng.standard_normal(shape), jnp.bfloat16)
    gamma = jnp.ones(128, jnp.float32)
    beta = jnp.zeros(128, jnp.float32)
    out = residual_dropout_layernorm(x, h, gamma, beta, interpret=True)
    assert out.dtype == jnp.bfloat16
    ref = ref_ln(x, h, gamma, beta)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref), atol=3e-2
    )


def test_dropout_statistics_and_grad_consistency():
    """Forward mask stats are right, and backward regenerates the SAME mask:
    for a linear function of the kernel output, grad wrt h must be zero
    exactly where the forward dropped h's contribution."""
    rng = np.random.default_rng(3)
    shape = (32, 128)
    x = jnp.zeros(shape, jnp.float32)
    h = jnp.asarray(rng.standard_normal(shape), jnp.float32) + 5.0
    gamma = jnp.ones(128, jnp.float32)
    beta = jnp.zeros(128, jnp.float32)
    p = 0.5
    key = jax.random.PRNGKey(0)

    try:
        out, grads = jax.value_and_grad(
            lambda h_: jnp.sum(
                residual_dropout_layernorm(
                    x, h_, gamma, beta, dropout=p, dropout_rng=key, interpret=True
                )
            )
        )(h)
    except NotImplementedError as e:  # pltpu.prng_* has no CPU interpret rule
        pytest.skip(f"in-kernel PRNG unavailable in interpret mode: {e}")

    # same rng -> same forward twice (mask is deterministic in the seed)
    out2 = jnp.sum(
        residual_dropout_layernorm(
            x, h, gamma, beta, dropout=p, dropout_rng=key, interpret=True
        )
    )
    np.testing.assert_allclose(float(out), float(out2), rtol=1e-6)

    # different rng -> different mask
    out3 = jnp.sum(
        residual_dropout_layernorm(
            x, h, gamma, beta, dropout=p, dropout_rng=jax.random.PRNGKey(9),
            interpret=True,
        )
    )
    assert abs(float(out) - float(out3)) > 1e-6

    # keep-rate in a plausible band (4096 samples, p=0.5)
    y = residual_dropout_layernorm(
        x, h, gamma, beta, dropout=p, dropout_rng=key, interpret=True
    )
    # recover the mask: z = keep*h/(1-p); LN of z with gamma=1 beta=0 —
    # instead infer from grads: dh is exactly 0 where dropped
    dropped = np.asarray(grads) == 0.0
    frac = dropped.mean()
    assert 0.4 < frac < 0.6, frac
    assert np.isfinite(np.asarray(y)).all()


def test_matches_flax_layernorm():
    """Against the exact nn.LayerNorm used in models/transformer.py."""
    import flax.linen as nn

    rng = np.random.default_rng(4)
    shape = (2, 16, 256)
    x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    h = jnp.asarray(rng.standard_normal(shape), jnp.float32)

    ln = nn.LayerNorm(epsilon=EPS, param_dtype=jnp.float32)
    variables = ln.init(jax.random.PRNGKey(0), x)
    gamma = variables["params"]["scale"]
    beta = variables["params"]["bias"]

    ref = ln.apply(variables, x + h)
    out = residual_dropout_layernorm(x, h, gamma, beta, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_pick_rows_scales_with_width():
    """Row blocks shrink as d grows so the backward's ~10 (rows, d) fp32
    stack temporaries stay under the 16 MiB scoped-VMEM limit: (512, 1024)
    was rejected on-chip at 16.59 MiB (round 4, /tmp/d1024_train.log)."""
    from transformertts_tpu.ops.pallas.fused_ln import _pick_rows

    assert _pick_rows(8192, 256) == 512   # tuned parity-config block kept
    assert _pick_rows(8192, 512) == 512   # paper config unchanged
    assert _pick_rows(8192, 1024) == 256  # the rejected case, halved
    assert _pick_rows(8192, 4096) == 64
    for d in (256, 512, 1024, 4096):
        rows = _pick_rows(8192, d)
        assert rows * d * 40 < 15 * 1024 * 1024, (d, rows)
    assert _pick_rows(7, 256) == 7  # odd tiny n: single block (interpret)
