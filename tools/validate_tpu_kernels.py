"""On-chip validation of the Pallas kernels' dropout paths.

The kernels regenerate their dropout masks in the backward pass from a
layout-independent counter-hash (ops/pallas/dropout_mask.py).  The CPU test
suite (tests/test_dropout_mask.py) runs the same checks in interpret mode;
this script repeats them COMPILED on the real TPU, because the hazard that
motivated the hash — Mosaic assigning fwd and bwd kernels different vector
layouts, which silently decorrelated pltpu.prng_random_bits masks for
rectangular shapes — only manifests in compiled kernels:

- determinism: same seed -> identical forward twice; different seed differs;
- keep-rate within a statistical band;
- fwd/bwd mask agreement: directional finite difference of the seeded
  forward must match the analytic directional derivative (a mismatched
  backward mask corrupts gradients silently otherwise);
- no-dropout parity against the XLA path.

Run: python tools/validate_tpu_kernels.py   (needs the TPU backend)
"""

import numpy as np

import jax
import jax.numpy as jnp

import pathlib as _pl, sys as _sys
_sys.path.insert(0, str(_pl.Path(__file__).resolve().parent.parent))

from transformertts_tpu.ops.pallas.flash_attention import flash_attention
from transformertts_tpu.ops.pallas.fused_ffn import fused_ffn
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

    # fwd/bwd mask agreement: out = Dropout(P) @ V is linear in V for a
    # fixed mask (P ignores V), so the symmetric difference of the seeded
    # forward at ±vdir equals the analytic directional derivative.  The
    # zero baseline matters: Mosaic's default-precision fp32 matmul rounds
    # operands to bf16, and bf16(-v) == -bf16(v), so the operand rounding
    # cancels instead of burying a small eps-perturbation (a mask mismatch
    # is an O(1) relative error either way; observed 61% pre-fix).
    fv = lambda v_, kk: flash_attention(  # noqa: E731
        q, k, v_, None, causal=True, dropout=0.3, dropout_rng=kk
    )
    vdir = jnp.asarray(rng.standard_normal((B, T, H, D)), jnp.float32)
    gv = jax.grad(lambda v_: jnp.sum(fv(v_, key)))(jnp.zeros_like(v))
    analytic = float(np.asarray(gv, np.float64).ravel()
                     @ np.asarray(vdir, np.float64).ravel())
    yp = np.asarray(fv(vdir, key), np.float64).sum()
    ym = np.asarray(fv(-vdir, key), np.float64).sum()
    fd = float((yp - ym) / 2.0)
    rel = abs(fd - analytic) / (abs(analytic) + 1e-9)
    # threshold: the failure mode this detects — layout-dependent PRNG
    # giving the backward an ~independent mask — measures O(1) here (0.61
    # observed); residual numerics are draw-dependent (see the fused_ffn
    # check below; <= 2.1e-2 observed).  Small partial corruptions are the
    # interpret-mode tests' job (exact arithmetic catches ANY mismatch).
    check("flash fwd/bwd mask agreement", rel < 0.05,
          f"analytic={analytic:.4f} fd={fd:.4f} rel={rel:.3e}")

    # no-dropout parity against the XLA path on-chip.  Tolerance: Mosaic's
    # default-precision fp32 matmul rounds MXU operands to bf16; the kernel
    # feeds the PV matmul UNNORMALIZED exp values (normalization is applied
    # to the output — the deferred-scalar optimization), while the XLA path
    # rounds the normalized probabilities, so the two round different
    # quantities and diverge by O(bf16 eps) * ||v|| (~6e-3 observed) even
    # though both are within bf16 rounding of the exact softmax.  Interpret
    # mode (true fp32 matmuls) agrees to ~1e-6 (tests/test_pallas_attention).
    from transformertts_tpu.models.attention import dot_product_attention
    from transformertts_tpu.models.masks import causal_bias

    ref, _ = dot_product_attention(q, k, v, causal_bias(T))
    out = np.asarray(flash_attention(q, k, v, None, causal=True))
    check("flash on-chip parity", np.abs(out - np.asarray(ref)).max() < 1.5e-2,
          f"max|diff|={np.abs(out - np.asarray(ref)).max():.2e}")


def validate_fused_ffn():
    rng = np.random.default_rng(3)
    n, d, f_dim = 256, 256, 1024
    x = jnp.asarray(rng.standard_normal((n, d)) * 0.5, jnp.float32)
    w1 = jnp.asarray(rng.standard_normal((d, f_dim)) * 0.05, jnp.float32)
    b1 = jnp.asarray(rng.standard_normal(f_dim) * 0.05, jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((f_dim, d)) * 0.05, jnp.float32)
    b2 = jnp.asarray(rng.standard_normal(d) * 0.05, jnp.float32)
    key = jax.random.PRNGKey(0)

    ref = np.asarray(jnp.maximum(x @ w1 + b1, 0.0) @ w2 + b2)
    got = np.asarray(fused_ffn(x, w1, b1, w2, b2))
    check("fused_ffn on-chip parity (no dropout)",
          np.abs(got - ref).max() < 5e-4, f"max|d|={np.abs(got - ref).max():.2e}")

    p = 0.5
    f = lambda x_, k: fused_ffn(x_, w1, b1, w2, b2, dropout=p, dropout_rng=k)  # noqa: E731
    out1 = np.asarray(f(x, key))
    out2 = np.asarray(f(x, key))
    check("fused_ffn determinism", np.array_equal(out1, out2))
    out3 = np.asarray(f(x, jax.random.PRNGKey(9)))
    check("fused_ffn seed sensitivity", not np.array_equal(out1, out3))

    # exact keep-rate: W1=0, b1=const>0, W2=I makes the output equal the
    # dropped hidden layer directly — zeros are exactly the dropped units
    eye = jnp.eye(d, dtype=jnp.float32)
    probe = np.asarray(fused_ffn(
        x, jnp.zeros((d, d)), jnp.full((d,), 5.0), eye, jnp.zeros((d,)),
        dropout=p, dropout_rng=key,
    ))
    dropped = (probe == 0.0).mean()
    check("fused_ffn keep-rate", 0.45 < dropped < 0.55, f"dropped={dropped:.3f}")
    kept_vals = probe[probe != 0.0]
    check("fused_ffn inverted scaling", np.allclose(kept_vals, 10.0, atol=1e-3),
          f"kept mean={kept_vals.mean():.3f} (expect 10.0)")

    # fwd/bwd consistency: symmetric difference of the SAME seeded forward
    # at ±v around a ZERO baseline must match the analytic directional
    # derivative.  b1 shifted +5 keeps every hidden unit off the ReLU kink
    # (|v @ W1| << 5), so the map is linear in x for a fixed mask; the zero
    # baseline + ±v symmetry cancels the bf16 operand rounding of Mosaic's
    # default-precision fp32 matmul (see the flash check).  A fwd/bwd mask
    # mismatch is an O(1) discrepancy (observed 61% with prng_random_bits).
    fl = lambda x_, k: fused_ffn(x_, w1, b1 + 5.0, w2, b2, dropout=p, dropout_rng=k)  # noqa: E731
    v = jnp.asarray(rng.standard_normal((n, d)) * 0.5, jnp.float32)
    g = jax.grad(lambda x_: jnp.sum(fl(x_, key)))(jnp.zeros_like(x))
    analytic = float(np.asarray(g, np.float64).ravel() @ np.asarray(v, np.float64).ravel())
    # sums in float64 on host: the on-chip fp32 reduction over 65k elements
    # rounds away the numerator
    yp = np.asarray(fl(v, key), np.float64).sum()
    ym = np.asarray(fl(-v, key), np.float64).sum()
    fd = float((yp - ym) / 2.0)
    rel = abs(fd - analytic) / (abs(analytic) + 1e-9)
    # threshold: a true fwd/bwd mask mismatch (layout-dependent PRNG giving
    # the backward an ~independent mask) measures O(1) here — 0.61 observed;
    # the residual numerics are draw-dependent — the ±v symmetry cancels
    # most but not all of the bf16 operand rounding around the +5 bias
    # shift, and the denominator varies with which units the mask keeps
    # (rel 9e-4 .. 2.1e-2 observed across mask draws).  2.5x the observed
    # band keeps 12x headroom to the failure signal; exact-arithmetic
    # agreement (which catches arbitrarily small corruption) is pinned in
    # interpret mode (tests/test_dropout_mask.py).
    check("fused_ffn fwd/bwd mask agreement", rel < 0.05,
          f"analytic={analytic:.4f} fd={fd:.4f} rel={rel:.3e}")


if __name__ == "__main__":
    dev = jax.devices()[0]
    print(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')}")
    if dev.platform != "tpu":
        raise SystemExit("needs the TPU backend (kernels run compiled, not interpreted)")
    validate_fused_ln()
    validate_flash()
    validate_fused_ffn()
    print("all TPU kernel dropout validations passed")
