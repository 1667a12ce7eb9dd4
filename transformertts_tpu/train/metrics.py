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


def mcd_dtw(pred_mel: np.ndarray, true_mel: np.ndarray, n_coeffs: int = 13) -> float:
    """MCD in dB under a DTW alignment (the standard TTS eval protocol).

    Free-running decode has no ground-truth timing anchor: a synthesis
    that pauses two frames longer at one word boundary shifts every later
    frame, and the frame-wise ``mel_cepstral_distortion`` then compares
    mismatched phones for the rest of the utterance.  MCD-DTW warps the
    two cepstral sequences onto a monotone common path first (steps
    (1,1), (1,0), (0,1)), so it measures spectral error net of pacing —
    both numbers together decompose the free-running gap into
    timing drift vs genuine spectral degradation.

    Host-side numpy (O(Tp*Tt) DP, ~1 ms at T~800); inputs are single
    utterances (Tp, n_mels) / (Tt, n_mels) log-mel.
    """
    n_mels = pred_mel.shape[-1]
    dct = _dct_matrix(n_mels)[1 : n_coeffs + 1]  # drop c0 (energy)
    # float64: the ||a||^2+||b||^2-2ab expansion cancels catastrophically
    # in float32 when a ~ b (identical-input MCD came out 1e-3, not 0)
    cp = pred_mel.astype(np.float64) @ dct.T.astype(np.float64)  # (Tp, K)
    ct = true_mel.astype(np.float64) @ dct.T.astype(np.float64)  # (Tt, K)
    # pairwise frame distances
    d = np.sqrt(
        np.maximum(
            np.sum(cp**2, 1)[:, None] + np.sum(ct**2, 1)[None, :]
            - 2.0 * (cp @ ct.T),
            0.0,
        )
        + 1e-12
    )  # (Tp, Tt)
    tp, tt = d.shape
    inf = float("inf")
    # plain-Python DP rows: ~3x faster than numpy scalar indexing here
    prev_a = [0.0] + [inf] * tt
    prev_p = [0] * (tt + 1)
    for i in range(1, tp + 1):
        di = d[i - 1].tolist()
        cur_a = [inf] * (tt + 1)
        cur_p = [0] * (tt + 1)
        for j in range(1, tt + 1):
            a_diag, a_up, a_left = prev_a[j - 1], prev_a[j], cur_a[j - 1]
            if a_diag <= a_up and a_diag <= a_left:
                best, blen = a_diag, prev_p[j - 1]
            elif a_up <= a_left:
                best, blen = a_up, prev_p[j]
            else:
                best, blen = a_left, cur_p[j - 1]
            cur_a[j] = di[j - 1] + best
            cur_p[j] = blen + 1
        prev_a, prev_p = cur_a, cur_p
    scale = 10.0 * math.sqrt(2.0) / math.log(10.0)
    return float(scale * prev_a[tt] / max(prev_p[tt], 1))


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
