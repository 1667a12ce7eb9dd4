"""Block-wise scheduled sampling — the reference's signature training trick
(ref: utils/util.py:103-120, lightning_module.py:53-74).

Per frame, draw Bernoulli(1 - p_tf) seeds, dilate them into ~L_bar-wide
blocks with a stride-1 max-pool (kernel L_bar, pad L_bar//2, output cropped
to T — torch ``max_pool1d`` emits T+1 positions for even L_bar), and replace
ground-truth frames with detached model predictions inside the blocks; zero
everything beyond the valid length.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from transformertts_tpu.models.masks import lengths_to_valid_mask


def block_mask(rng: jax.Array, batch: int, t: int, p_tf, l_bar: int = 8) -> jnp.ndarray:
    """(B, T) bool mask: True = use model prediction instead of ground truth."""
    seed = jax.random.bernoulli(rng, 1.0 - p_tf, (batch, t)).astype(jnp.float32)
    pad = l_bar // 2
    # torch max_pool1d(kernel=l_bar, stride=1, padding=pad): output length
    # T + 2*pad - l_bar + 1; reference crops to [:T] (utils/util.py:110)
    dilated = jax.lax.reduce_window(
        seed,
        -jnp.inf,
        jax.lax.max,
        window_dimensions=(1, l_bar),
        window_strides=(1, 1),
        padding=((0, 0), (pad, pad)),
    )
    return dilated[:, :t] > 0.5


def apply_teacher_forcing(
    rng: jax.Array,
    pred_melspec: jnp.ndarray,  # (B, T, C) first-pass predictions
    melspec: jnp.ndarray,  # (B, T, C) ground truth
    melspec_lens: jnp.ndarray,  # (B,)
    p_tf,
    l_bar: int = 8,
) -> jnp.ndarray:
    """Mix detached predictions into GT in blocks, zero past valid length."""
    b, t, _ = pred_melspec.shape
    mask = block_mask(rng, b, t, p_tf, l_bar)[:, :, None]
    mixed = jnp.where(mask, jax.lax.stop_gradient(pred_melspec), melspec)
    valid = lengths_to_valid_mask(melspec_lens, t)[:, :, None]
    return jnp.where(valid, mixed, 0.0)
