"""Layout-independent dropout keep-mask for Pallas kernels.

All fused kernels here (flash_attention, fused_ln, fused_ffn) avoid saving
their dropout masks to HBM by *regenerating* them in the backward pass.
The original recipe — ``pltpu.prng_seed(seed, block)`` +
``prng_random_bits(shape)`` — is NOT safe for that: the bit assigned to a
given logical element depends on the vector layout Mosaic picks for the
random-bits op, and the forward and backward kernels of the same op can be
assigned *different* layouts.  Observed on a v5e: a (256, 1024) mask
diverged completely between fwd and bwd kernels (≈50% element agreement,
i.e. independent masks — silently wrong dropout gradients) while the
square (256, 256) case happened to agree.

This module derives each element's keep/drop bit as a pure function of its
*logical* index — ``hash(seed, block_salt, row, col)``: a SplitMix-style
counter hash (golden-ratio stride + murmur3 finalizer round(s)) over a
per-element counter.  Layout can then never
change the assignment: identical arguments give identical masks in any
kernel, compiled or interpreted (it also works off-TPU in interpret mode,
unlike the Mosaic PRNG primitive).  Cost is a handful of VPU integer ops
per element, noise next to the matmuls these kernels exist to feed.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _fmix(x):
    """murmur3 32-bit finalizer: full avalanche on a counter input."""
    x = x ^ (x >> 16)
    x = x * jnp.uint32(0x85EBCA6B)
    x = x ^ (x >> 13)
    x = x * jnp.uint32(0xC2B2AE35)
    x = x ^ (x >> 16)
    return x


def keep_mask(shape, dropout: float, seed, salt):
    """Boolean keep-mask: True with probability ``1 - dropout``.

    shape: 2-D (rows, cols) mask shape.
    seed: traced int32 scalar — the per-call RNG seed.
    salt: traced int32 scalar — distinguishes grid blocks (so every block
        of one call draws distinct bits); pass the flattened block index.

    seed and salt are mixed through the finalizer BEFORE combining with
    the element counter: were they only added to the counter, two
    (seed, salt) pairs would index shifted windows of one global
    bit-stream and could share bitwise-identical mask regions wherever
    the windows overlap; XORing a fully-avalanched base into the counter
    makes the per-pair streams independent.
    """
    import os

    r = jax.lax.broadcasted_iota(jnp.uint32, shape, 0)
    c = jax.lax.broadcasted_iota(jnp.uint32, shape, 1)
    counter = r * jnp.uint32(shape[1]) + c
    base = _fmix(
        seed.astype(jnp.uint32) * jnp.uint32(0x9E3779B9)
        ^ _fmix(salt.astype(jnp.uint32) * jnp.uint32(0xBF58476D))
    )
    # per-element mixing: 1 finalizer round by default — SplitMix-style
    # counter hash (golden-ratio stride, then one full murmur3 avalanche on
    # top of the avalanched seed/salt base).  Measured 39.6 -> 37.8 ms on
    # the k=4 training step vs 2 rounds (tools/ab_layout.py; ~30 dropout
    # sites regenerate masks in fwd+bwd).  Both variants pass the
    # uniformity/decorrelation tests in tests/test_dropout_mask.py; set
    # TTS_DROPOUT_HASH_ROUNDS=2 for the extra avalanche round.
    rounds = int(os.environ.get("TTS_DROPOUT_HASH_ROUNDS", "1"))
    x = _fmix(counter * jnp.uint32(0x9E3779B9) ^ base)
    if rounds > 1:
        x = _fmix(x ^ jnp.uint32(0x94D049BB))
    threshold = jnp.uint32(int(dropout * 4294967296.0))
    return x >= threshold


def seed_from_rng(dropout: float, dropout_rng):
    """Derive the (1,) int32 scalar-prefetch seed for a kernel call.

    One home for the derivation shared by flash_attention / fused_ln /
    fused_ffn; raises when dropout is requested without an rng.
    """
    if dropout > 0.0:
        if dropout_rng is None:
            raise ValueError("dropout > 0 requires dropout_rng")
        return jax.random.randint(dropout_rng, (1,), 0, 2**31 - 1, jnp.int32)
    return jnp.zeros((1,), jnp.int32)
