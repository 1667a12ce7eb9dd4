"""Layout-independent dropout mask: statistics + fwd/bwd agreement.

The counter-hash mask (ops/pallas/dropout_mask.py) is a pure function of
(seed, block salt, logical index), so the forward and backward kernels of
flash_attention / fused_ln / fused_ffn are guaranteed the same mask by
construction.  These tests pin that down in interpret mode; the on-chip
variants live in tools/validate_tpu_kernels.py.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from transformertts_tpu.ops.pallas.dropout_mask import keep_mask
from transformertts_tpu.ops.pallas.flash_attention import flash_attention
from transformertts_tpu.ops.pallas.fused_ffn import fused_ffn
from transformertts_tpu.ops.pallas.fused_ln import residual_dropout_layernorm


# ------------------------------------------------------------- hash itself


@pytest.mark.parametrize("p", [0.1, 0.5, 0.9])
def test_keep_rate(p):
    m = np.asarray(keep_mask((256, 512), p, jnp.int32(1234), jnp.int32(7)))
    assert abs(m.mean() - (1 - p)) < 0.02


def test_pure_function_of_inputs():
    a = np.asarray(keep_mask((64, 128), 0.5, jnp.int32(5), jnp.int32(3)))
    b = np.asarray(keep_mask((64, 128), 0.5, jnp.int32(5), jnp.int32(3)))
    assert np.array_equal(a, b)
    c = np.asarray(keep_mask((64, 128), 0.5, jnp.int32(6), jnp.int32(3)))
    d = np.asarray(keep_mask((64, 128), 0.5, jnp.int32(5), jnp.int32(4)))
    assert not np.array_equal(a, c)
    assert not np.array_equal(a, d)
    # different seeds/salts should give ~independent masks, not shifts
    assert 0.4 < (a == c).mean() < 0.6
    assert 0.4 < (a == d).mean() < 0.6


def test_no_row_or_col_structure():
    m = np.asarray(keep_mask((128, 256), 0.5, jnp.int32(42), jnp.int32(0)))
    # every row/col should be mixed, not all-kept or all-dropped
    assert m.mean(axis=1).min() > 0.3 and m.mean(axis=1).max() < 0.7
    assert m.mean(axis=0).min() > 0.3 and m.mean(axis=0).max() < 0.7


@pytest.mark.parametrize("rounds", ["1", "2"])
def test_hash_round_statistics(monkeypatch, rounds):
    """Both hash variants (1-round default, 2-round via env) must keep the
    same statistical guarantees: correct keep rate, no row/col structure,
    independent streams across seeds/salts, and no correlation with
    adjacent counters."""
    monkeypatch.setenv("TTS_DROPOUT_HASH_ROUNDS", rounds)
    for p in (0.1, 0.5):
        m = np.asarray(keep_mask((256, 512), p, jnp.int32(1234), jnp.int32(7)))
        assert abs(m.mean() - (1 - p)) < 0.02
    m = np.asarray(keep_mask((128, 256), 0.5, jnp.int32(42), jnp.int32(0)))
    assert m.mean(axis=1).min() > 0.3 and m.mean(axis=1).max() < 0.7
    assert m.mean(axis=0).min() > 0.3 and m.mean(axis=0).max() < 0.7
    a = np.asarray(keep_mask((64, 128), 0.5, jnp.int32(5), jnp.int32(3)))
    c = np.asarray(keep_mask((64, 128), 0.5, jnp.int32(6), jnp.int32(3)))
    d = np.asarray(keep_mask((64, 128), 0.5, jnp.int32(5), jnp.int32(4)))
    assert 0.4 < (a == c).mean() < 0.6
    assert 0.4 < (a == d).mean() < 0.6
    # horizontally adjacent elements (counter+1) must be uncorrelated
    agree = (m[:, :-1] == m[:, 1:]).mean()
    assert 0.4 < agree < 0.6
    # and vertically adjacent (counter+cols)
    agree_v = (m[:-1, :] == m[1:, :]).mean()
    assert 0.4 < agree_v < 0.6


# ------------------------------- fwd/bwd mask agreement (interpret mode)
#
# Recipe: pick inputs so the kernel output is *linear* in one argument for
# a fixed mask (no ReLU kinks / softmax involvement).  Then the analytic
# directional derivative equals the exact finite difference of the seeded
# forward; a fwd/bwd mask mismatch shows up as an O(1) relative error.


def _dirderiv_check(f, x, v, eps=1e-2, rtol=1e-3, cot=None):
    """cot: fixed random cotangent — needed when sum(f) is degenerate
    (e.g. LayerNorm rows sum to ~0).  Sums run on host in float64: the
    device fp32 reduction would drown the O(eps) numerator in rounding."""
    def host(t):
        y = np.asarray(f(t), np.float64).ravel()
        return float(y.sum() if cot is None
                     else y @ np.asarray(cot, np.float64).ravel())

    loss = (lambda t: jnp.sum(f(t))) if cot is None else (lambda t: jnp.sum(f(t) * cot))
    g = jax.grad(loss)(x)
    analytic = float(np.asarray(g, np.float64).ravel() @ np.asarray(v, np.float64).ravel())
    fd = (host(x + eps * v) - host(x - eps * v)) / (2 * eps)
    assert abs(fd - analytic) / (abs(analytic) + 1e-9) < rtol, (analytic, fd)


def test_fused_ffn_fwd_bwd_mask_agreement():
    rng = np.random.default_rng(0)
    n, d, f_dim = 32, 128, 384  # rectangular on purpose
    x = jnp.asarray(rng.standard_normal((n, d)) * 0.3, jnp.float32)
    w1 = jnp.asarray(rng.standard_normal((d, f_dim)) * 0.05, jnp.float32)
    b1 = jnp.full((f_dim,), 5.0, jnp.float32)  # keep every unit off the ReLU kink
    w2 = jnp.asarray(rng.standard_normal((f_dim, d)) * 0.05, jnp.float32)
    b2 = jnp.zeros((d,), jnp.float32)
    key = jax.random.PRNGKey(3)
    v = jnp.asarray(rng.standard_normal((n, d)), jnp.float32)

    _dirderiv_check(
        lambda t: fused_ffn(t, w1, b1, w2, b2, dropout=0.5, dropout_rng=key,
                            interpret=True),
        x, v,
    )


def test_fused_ln_fwd_bwd_mask_agreement():
    rng = np.random.default_rng(1)
    n, d = 32, 128
    x = jnp.asarray(rng.standard_normal((n, d)), jnp.float32)
    h = jnp.asarray(rng.standard_normal((n, d)), jnp.float32)
    gamma = jnp.ones((d,), jnp.float32)
    beta = jnp.zeros((d,), jnp.float32)
    key = jax.random.PRNGKey(4)
    v = jnp.asarray(rng.standard_normal((n, d)), jnp.float32)

    # LN is nonlinear (tighter eps, looser tol); sum over a LN output is
    # ~0 by construction, so weight with a random cotangent
    cot = jnp.asarray(rng.standard_normal((n, d)), jnp.float32)
    _dirderiv_check(
        lambda t: residual_dropout_layernorm(
            x, t, gamma, beta, dropout=0.5, dropout_rng=key, interpret=True),
        h, v, eps=1e-3, rtol=5e-3, cot=cot,
    )


def test_flash_fwd_bwd_mask_agreement():
    rng = np.random.default_rng(2)
    b, tq, tk, h, d = 2, 16, 24, 2, 32
    q = jnp.asarray(rng.standard_normal((b, tq, h, d)) * 0.2, jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, tk, h, d)) * 0.2, jnp.float32)
    val = jnp.asarray(rng.standard_normal((b, tk, h, d)), jnp.float32)
    key = jax.random.PRNGKey(5)
    v_dir = jnp.asarray(rng.standard_normal((b, tk, h, d)), jnp.float32)

    # out = Dropout(P) @ V is linear in V for fixed mask (P ignores V),
    # so a large eps is exact and keeps the fd numerator well-conditioned
    _dirderiv_check(
        lambda t: flash_attention(q, k, t, dropout=0.5, dropout_rng=key,
                                  interpret=True),
        val, v_dir, eps=1.0,
    )


def test_flash_dropout_determinism_interpret():
    rng = np.random.default_rng(6)
    b, tq, tk, h, d = 2, 16, 16, 2, 32
    q = jnp.asarray(rng.standard_normal((b, tq, h, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, tk, h, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, tk, h, d)), jnp.float32)
    f = lambda key: np.asarray(  # noqa: E731
        flash_attention(q, k, v, dropout=0.3, dropout_rng=key, interpret=True))
    a, b2, c = f(jax.random.PRNGKey(0)), f(jax.random.PRNGKey(0)), f(jax.random.PRNGKey(1))
    assert np.array_equal(a, b2)
    assert not np.array_equal(a, c)
