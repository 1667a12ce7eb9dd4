"""Mask construction as additive attention biases.

The reference builds boolean ``key_padding_mask`` (True = pad) and a boolean
upper-triangular causal ``tgt_mask`` (ref: model/model.py:229-257).  Under
XLA we fold both into additive biases (0 = attend, -1e9 = blocked) with
static shapes so everything jits cleanly; lengths stay dynamic.
"""

from __future__ import annotations

import jax.numpy as jnp

NEG_INF = -1e9  # large-but-finite: representable in bfloat16, avoids NaN rows


def lengths_to_valid_mask(lengths: jnp.ndarray, max_len: int) -> jnp.ndarray:
    """(B,) lengths -> (B, max_len) bool, True where position < length."""
    pos = jnp.arange(max_len)[None, :]
    return pos < lengths[:, None]


def padding_bias(lengths: jnp.ndarray, max_len: int, dtype=jnp.float32) -> jnp.ndarray:
    """(B, 1, 1, max_len) additive bias masking padded KEY positions."""
    return key_padding_bias(lengths, max_len, dtype)[:, None, None, :]


def key_padding_bias(lengths: jnp.ndarray, max_len: int, dtype=jnp.float32) -> jnp.ndarray:
    """(B, max_len) additive key bias: 0 valid, NEG_INF padded."""
    valid = lengths_to_valid_mask(lengths, max_len)
    return jnp.where(valid, 0.0, NEG_INF).astype(dtype)


def causal_bias(t: int, dtype=jnp.float32) -> jnp.ndarray:
    """(1, 1, t, t) additive bias blocking attention to future positions."""
    mask = jnp.tril(jnp.ones((t, t), dtype=bool))
    return jnp.where(mask, 0.0, NEG_INF).astype(dtype)[None, None, :, :]


def combine(*biases: jnp.ndarray | None) -> jnp.ndarray | None:
    """Sum additive biases, skipping Nones (broadcast-compatible shapes)."""
    out = None
    for b in biases:
        if b is None:
            continue
        out = b if out is None else out + b
    return out
