"""Length-masked TTS losses (ref: loss.py:9-55) + guided attention (extra).

Reference semantics reproduced exactly:
- mel losses: MSE averaged over valid frames x channels only
  (``mel[mask].view(-1, C)`` then mean — loss.py:34-40),
  total mel = pred + 0.5 * post.
- stop loss: BCE-with-logits over valid frames with ``pos_weight`` on the
  positive class; the gate target is 1 ONLY at the exact last valid frame
  (``seq_range == lengths - 1`` — loss.py:31).

Guided-attention loss (not in the reference; BASELINE.json config 5):
Tacotron-2-style diagonal prior ``W[t,n] = 1 - exp(-(n/N - t/T)^2 / 2s^2)``
applied to the decoder cross-attention weights.
"""

from __future__ import annotations

import jax.numpy as jnp

from transformertts_tpu.models.masks import lengths_to_valid_mask


def _masked_mean(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Mean of x over positions where mask (broadcastable) is True."""
    mask = jnp.broadcast_to(mask, x.shape)
    total = jnp.sum(jnp.where(mask, x, 0.0))
    count = jnp.maximum(jnp.sum(mask), 1)
    return total / count


def _bce_with_logits(logits, targets, pos_weight):
    # torch F.binary_cross_entropy_with_logits(pos_weight=w):
    #   w*y*softplus(-x) + (1-y)*softplus(x)
    sp = jnp.logaddexp(0.0, -logits)  # softplus(-x)
    sn = jnp.logaddexp(0.0, logits)  # softplus(x)
    return pos_weight * targets * sp + (1.0 - targets) * sn


def tts_loss(
    outputs: dict,
    mel: jnp.ndarray,  # (B, T, C) ground truth
    lengths: jnp.ndarray,  # (B,)
    stop_weight: float = 8.0,
    post_mel_weight: float = 0.5,
    stop_gate_k: int = 1,
) -> dict:
    pred = outputs["pred_melspec"].astype(jnp.float32)
    post = outputs["post_melspec"].astype(jnp.float32)
    stop = outputs["pred_stop"].astype(jnp.float32)
    mel = mel.astype(jnp.float32)

    b, t, c = pred.shape
    valid = lengths_to_valid_mask(lengths, t)  # (B, T)
    frame_mask = valid[:, :, None]

    pred_mel_loss = _masked_mean((pred - mel) ** 2, frame_mask)
    post_mel_loss = _masked_mean((post - mel) ** 2, frame_mask)
    mel_loss = pred_mel_loss + post_mel_weight * post_mel_loss

    # gate target: 1 over the last ``stop_gate_k`` valid frames.  k=1 is the
    # reference's exact-last-frame semantics (loss.py:31); k>1 is the opt-in
    # tolerant gate (config.loss.stop_gate_k) — positions beyond lengths-1
    # are excluded by the valid mask either way.
    pos = jnp.arange(t)[None, :]
    gate = (pos >= (lengths[:, None] - stop_gate_k)).astype(jnp.float32)
    stop_loss = _masked_mean(_bce_with_logits(stop, gate, stop_weight), valid)

    return {
        "total": mel_loss + stop_loss,
        "pred_mel": pred_mel_loss,
        "post_mel": post_mel_loss,
        "stop": stop_loss,
    }


def guided_attention_loss(
    alignments: jnp.ndarray,  # (L, B, H, T_mel, T_phon)
    mel_lens: jnp.ndarray,  # (B,)
    phoneme_lens: jnp.ndarray,  # (B,)
    sigma: float = 0.4,
) -> jnp.ndarray:
    _, b, _, t_mel, t_phon = alignments.shape
    t_idx = jnp.arange(t_mel, dtype=jnp.float32)[None, :, None]  # (1, T_mel, 1)
    n_idx = jnp.arange(t_phon, dtype=jnp.float32)[None, None, :]  # (1, 1, T_phon)
    t_norm = t_idx / jnp.maximum(mel_lens[:, None, None].astype(jnp.float32), 1.0)
    n_norm = n_idx / jnp.maximum(phoneme_lens[:, None, None].astype(jnp.float32), 1.0)
    w = 1.0 - jnp.exp(-((n_norm - t_norm) ** 2) / (2.0 * sigma**2))  # (B, T_mel, T_phon)

    valid = (
        lengths_to_valid_mask(mel_lens, t_mel)[:, :, None]
        & lengths_to_valid_mask(phoneme_lens, t_phon)[:, None, :]
    )  # (B, T_mel, T_phon)
    penalty = alignments.astype(jnp.float32) * w[None, :, None]  # broadcast L, H
    mask = jnp.broadcast_to(valid[None, :, None], penalty.shape)
    return jnp.sum(jnp.where(mask, penalty, 0.0)) / jnp.maximum(jnp.sum(mask), 1)


def alignment_diagonality(
    alignments: jnp.ndarray,  # (L, B, H, T_mel, T_phon)
    mel_lens: jnp.ndarray,
    phoneme_lens: jnp.ndarray,
    band: float = 0.2,
) -> jnp.ndarray:
    """Fraction of attention mass within a +-band diagonal corridor.

    The parity metric for "alignment diagonality" (BASELINE.md): 1.0 means
    all cross-attention mass lies on the ideal monotonic diagonal.
    """
    _, b, _, t_mel, t_phon = alignments.shape
    t_idx = jnp.arange(t_mel, dtype=jnp.float32)[None, :, None]
    n_idx = jnp.arange(t_phon, dtype=jnp.float32)[None, None, :]
    t_norm = t_idx / jnp.maximum(mel_lens[:, None, None].astype(jnp.float32), 1.0)
    n_norm = n_idx / jnp.maximum(phoneme_lens[:, None, None].astype(jnp.float32), 1.0)
    near = (jnp.abs(n_norm - t_norm) <= band)  # (B, T_mel, T_phon)

    valid_q = lengths_to_valid_mask(mel_lens, t_mel)[:, :, None]
    mass = jnp.where(near[None, :, None], alignments, 0.0).sum(-1)  # (L,B,H,T_mel)
    mask_q = jnp.broadcast_to(valid_q[None, :, None, :, 0], mass.shape)
    return jnp.sum(jnp.where(mask_q, mass, 0.0)) / jnp.maximum(jnp.sum(mask_q), 1)
