"""Evaluation metrics beyond the reference's val_loss (SURVEY.md §5.5).

- Mel-cepstral distortion (MCD): DCT-II of log-mel -> frame-wise L2 over
  cepstra 1..K, the standard objective TTS quality proxy.
- Stop-token accuracy / recall at threshold 0.5 over valid frames.
"""

from __future__ import annotations

import functools
import math

import jax.numpy as jnp
import numpy as np

from transformertts_tpu.models.masks import lengths_to_valid_mask


@functools.lru_cache(maxsize=4)
def _dct_matrix(n: int) -> np.ndarray:
    """Orthonormal DCT-II basis, (n, n): C @ x computes the DCT."""
    k = np.arange(n)[:, None]
    i = np.arange(n)[None, :]
    mat = np.cos(np.pi * k * (2 * i + 1) / (2 * n)) * math.sqrt(2.0 / n)
    mat[0] *= math.sqrt(0.5)
    return mat.astype(np.float32)


def mel_cepstral_distortion(
    pred_mel: jnp.ndarray,  # (B, T, n_mels) log-mel
    true_mel: jnp.ndarray,
    lengths: jnp.ndarray,  # (B,)
    n_coeffs: int = 13,
) -> jnp.ndarray:
    """Mean MCD in dB over valid frames (coefficients 1..n_coeffs)."""
    n_mels = pred_mel.shape[-1]
    dct = jnp.asarray(_dct_matrix(n_mels))[1 : n_coeffs + 1]  # drop c0 (energy)
    cp = jnp.einsum("btm,km->btk", pred_mel.astype(jnp.float32), dct)
    ct = jnp.einsum("btm,km->btk", true_mel.astype(jnp.float32), dct)
    dist = jnp.sqrt(jnp.sum((cp - ct) ** 2, axis=-1) + 1e-12)  # (B, T)
    scale = 10.0 * math.sqrt(2.0) / math.log(10.0)
    valid = lengths_to_valid_mask(lengths, dist.shape[1])
    return scale * jnp.sum(jnp.where(valid, dist, 0.0)) / jnp.maximum(valid.sum(), 1)


def stop_token_metrics(
    stop_logits: jnp.ndarray,  # (B, T)
    lengths: jnp.ndarray,  # (B,)
    threshold: float = 0.5,
) -> dict:
    """Accuracy over valid frames + recall of the exact stop frame, plus a
    ±2-frame tolerant recall (a 2-frame offset is ~23 ms of audio — the
    strict exact-frame recall under-reports a stop head that is already
    usable for decode termination)."""
    t = stop_logits.shape[1]
    valid = lengths_to_valid_mask(lengths, t)
    idx = jnp.arange(t)[None, :]
    gate = idx == (lengths[:, None] - 1)
    near = jnp.abs(idx - (lengths[:, None] - 1)) <= 2
    predicted = stop_logits >= _logit(threshold)
    correct = jnp.where(valid, predicted == gate, False)
    accuracy = correct.sum() / jnp.maximum(valid.sum(), 1)
    stop_hit = jnp.where(gate, predicted, False).sum() / jnp.maximum(gate.sum(), 1)
    # a row counts for tolerant recall if ANY frame within ±2 fires;
    # restrict to real rows (length > 0) — bucket-padded dummy rows have
    # no stop frame and must not dilute the mean (they made the tolerant
    # recall read BELOW the strict one)
    row_real = lengths > 0
    near_hit = jnp.where(near, predicted, False).any(axis=1) & row_real
    return {
        "stop_accuracy": accuracy,
        "stop_recall": stop_hit,
        "stop_recall_2": near_hit.sum() / jnp.maximum(row_real.sum(), 1),
    }


def _logit(p: float) -> float:
    return math.log(p / (1.0 - p))
