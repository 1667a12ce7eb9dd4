"""Fused STFT->mel Pallas kernel parity vs the numpy reference impl."""

import numpy as np
import pytest

import jax.numpy as jnp

from transformertts_tpu.dsp import mel_spectrogram_np
from transformertts_tpu.ops.pallas.stft import log_mel_pallas

KW = dict(sample_rate=22050, n_fft=1024, hop_length=256, win_length=1024,
          fmin=0.0, fmax=8000.0, n_mels=80)


def test_parity_with_numpy():
    rng = np.random.default_rng(0)
    y = (rng.standard_normal(22050) * 0.3).astype(np.float32)
    ref = mel_spectrogram_np(y, **KW)
    out = np.asarray(log_mel_pallas(jnp.asarray(y), interpret=True, **KW))
    assert out.shape == ref.shape
    # matmul-DFT in fp32 vs numpy double FFT: small absolute error on log-mel
    np.testing.assert_allclose(out, ref, atol=2e-2)
    # near-silence bins (log clip) match exactly
    assert np.mean(np.abs(out - ref)) < 2e-3


def test_batched():
    rng = np.random.default_rng(1)
    y = (rng.standard_normal((2, 8192)) * 0.2).astype(np.float32)
    out = np.asarray(log_mel_pallas(jnp.asarray(y), interpret=True, **KW))
    assert out.shape == (2, 80, 1 + 8192 // 256)
    ref0 = mel_spectrogram_np(y[0], **KW)
    np.testing.assert_allclose(out[0], ref0, atol=2e-2)


def test_sine_tone():
    sr = 22050
    t = np.arange(sr // 2) / sr
    y = (0.5 * np.sin(2 * np.pi * 1000 * t)).astype(np.float32)
    out = np.asarray(log_mel_pallas(jnp.asarray(y), interpret=True, **KW))
    ref = mel_spectrogram_np(y, **KW)
    # peak mel band identical
    assert out.mean(1).argmax() == ref.mean(1).argmax()


def test_center_false_matches_host_prepad():
    """center=False over a host reflect-padded, zero-extended signal must
    reproduce the center=True result exactly for the true frame count (the
    batched-preprocess contract)."""
    rng = np.random.default_rng(3)
    n = 22050 + 777
    y = (rng.standard_normal(n) * 0.3).astype(np.float32)
    ref = np.asarray(log_mel_pallas(jnp.asarray(y), interpret=True, **KW))

    pad = KW["n_fft"] // 2
    bucket = 32768
    padded = np.zeros(bucket, np.float32)
    padded[: n + 2 * pad] = np.pad(y, pad, mode="reflect")
    out = np.asarray(
        log_mel_pallas(jnp.asarray(padded), interpret=True, center=False, **KW)
    )
    n_frames = 1 + n // KW["hop_length"]
    np.testing.assert_allclose(out[:, :n_frames], ref, atol=1e-4)


def test_center_false_jax_path():
    from transformertts_tpu.dsp import mel_spectrogram_jax

    rng = np.random.default_rng(4)
    n = 22050
    y = (rng.standard_normal(n) * 0.3).astype(np.float32)
    ref = np.asarray(mel_spectrogram_jax(jnp.asarray(y), **KW))
    pad = KW["n_fft"] // 2
    padded = np.zeros(n + 2 * pad + 999, np.float32)
    padded[: n + 2 * pad] = np.pad(y, pad, mode="reflect")
    out = np.asarray(mel_spectrogram_jax(jnp.asarray(padded), center=False, **KW))
    n_frames = 1 + n // KW["hop_length"]
    np.testing.assert_allclose(out[:, :n_frames], ref, atol=1e-4)
