"""Fused STFT-magnitude -> mel -> log Pallas kernel.

Replaces librosa's host-side FFT pipeline (ref: audio.py:32-51) with an
MXU-native formulation: for windowed frames X (block, n_fft),

  Re = X @ C,  Im = X @ S          (DFT as two matmuls -> MXU)
  mag = sqrt(Re^2 + Im^2 + eps')   (VPU)
  mel = mag @ M^T                  (matmul -> MXU)
  out = log(clip(mel, 1e-5))       (VPU)

The n_fft x n_bins DFT matrices and the mel basis stay resident in VMEM
across the frame-block grid; the (frames, 513) magnitude spectrum never
touches HBM.  Frequency dims are zero-padded to lane multiples (513 -> 640)
— the padded bins carry zero weight in the (also padded) mel basis, so the
result is exact.

Matches ``dsp.mel.mel_spectrogram_np`` to ~1e-3 absolute (fp32 matmul-DFT
vs numpy FFT); parity tested in tests/test_pallas_stft.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from transformertts_tpu.dsp.mel import dft_matrices, hann_window, mel_filterbank


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


@functools.lru_cache(maxsize=4)
def _constants(sample_rate, n_fft, n_mels, fmin, fmax):
    n_bins = 1 + n_fft // 2
    n_pad = _round_up(n_bins, 128)
    cos, sin = dft_matrices(n_fft)  # (n_fft, n_bins)
    cos_p = np.zeros((n_fft, n_pad), np.float32)
    sin_p = np.zeros((n_fft, n_pad), np.float32)
    cos_p[:, :n_bins], sin_p[:, :n_bins] = cos, sin
    basis = mel_filterbank(sample_rate, n_fft, n_mels, fmin, fmax)  # (n_mels, n_bins)
    basis_p = np.zeros((n_pad, n_mels), np.float32)
    basis_p[:n_bins] = basis.T
    return jnp.asarray(cos_p), jnp.asarray(sin_p), jnp.asarray(basis_p)


def _kernel(frames_ref, cos_ref, sin_ref, basis_ref, out_ref):
    x = frames_ref[...]  # (block, n_fft)
    re = jnp.dot(x, cos_ref[...], preferred_element_type=jnp.float32)
    im = jnp.dot(x, sin_ref[...], preferred_element_type=jnp.float32)
    mag = jnp.sqrt(re * re + im * im)
    mel = jnp.dot(mag, basis_ref[...], preferred_element_type=jnp.float32)
    out_ref[...] = jnp.log(jnp.clip(mel, min=1e-5))


def log_mel_pallas(
    y: jnp.ndarray,  # (n_samples,) or (B, n_samples)
    sample_rate: int = 22050,
    n_fft: int = 1024,
    hop_length: int = 256,
    win_length: int = 1024,
    fmin: float = 0.0,
    fmax: float = 8000.0,
    n_mels: int = 80,
    block: int = 128,
    interpret: bool = False,
    center: bool = True,
) -> jnp.ndarray:
    """Log-mel via the fused kernel. Returns (..., n_mels, n_frames) like
    the reference layout (audio.py:48-51).

    ``center=False``: y is already padded; frames read it directly (see
    mel_spectrogram_jax — used for batched variable-length extraction)."""
    squeeze = y.ndim == 1
    if squeeze:
        y = y[None]
    b, n = y.shape

    window = jnp.asarray(hann_window(win_length))
    if win_length < n_fft:
        lpad = (n_fft - win_length) // 2
        window = jnp.pad(window, (lpad, n_fft - win_length - lpad))

    if center:
        pad = n_fft // 2
        y_pad = jnp.pad(y, ((0, 0), (pad, pad)), mode="reflect")
        n_frames = 1 + n // hop_length
    else:
        y_pad = y
        n_frames = 1 + (n - n_fft) // hop_length
    n_frames_pad = _round_up(n_frames, block)
    idx = jnp.arange(n_frames_pad)[:, None] * hop_length + jnp.arange(n_fft)[None, :]
    idx = jnp.minimum(idx, y_pad.shape[1] - 1)  # clamp the padding frames
    frames = (y_pad[:, idx] * window[None, None, :]).reshape(b * n_frames_pad, n_fft)

    cos_p, sin_p, basis_p = _constants(sample_rate, n_fft, n_mels, float(fmin), float(fmax))
    n_pad = cos_p.shape[1]

    grid = (b * n_frames_pad // block,)
    out = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block, n_fft), lambda i: (i, 0)),
            pl.BlockSpec((n_fft, n_pad), lambda i: (0, 0)),
            pl.BlockSpec((n_fft, n_pad), lambda i: (0, 0)),
            pl.BlockSpec((n_pad, n_mels), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((block, n_mels), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((b * n_frames_pad, n_mels), jnp.float32),
        interpret=interpret,
    )(frames, cos_p, sin_p, basis_p)

    out = out.reshape(b, n_frames_pad, n_mels)[:, :n_frames].transpose(0, 2, 1)
    return out[0] if squeeze else out
