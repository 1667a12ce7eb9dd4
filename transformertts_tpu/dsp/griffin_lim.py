"""Griffin-Lim mel -> waveform inversion (JAX).

The reference produces mel spectrograms only (no vocoder).  For an audible
end-to-end path we invert our own features: log-mel -> linear magnitude via
a non-negative pseudo-inverse of the slaney filterbank, then Griffin-Lim
phase recovery with jit-compiled STFT/iSTFT built on dsp.mel primitives.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from transformertts_tpu.dsp.mel import hann_window, mel_filterbank


@functools.lru_cache(maxsize=4)
def _inv_mel_basis(sr: int, n_fft: int, n_mels: int, fmin: float, fmax: float) -> np.ndarray:
    basis = mel_filterbank(sr, n_fft, n_mels, fmin, fmax)  # (n_mels, bins)
    inv = np.linalg.pinv(basis)
    return np.maximum(inv, 0.0).astype(np.float32)  # (bins, n_mels)


def mel_to_linear(log_mel: jnp.ndarray, sr=22050, n_fft=1024, fmin=0.0, fmax=8000.0) -> jnp.ndarray:
    """(n_mels, T) log-mel -> (bins, T) linear magnitude estimate."""
    inv = jnp.asarray(_inv_mel_basis(sr, n_fft, log_mel.shape[0], float(fmin), float(fmax)))
    return jnp.maximum(inv @ jnp.exp(log_mel), 1e-10)


def _stft(y, n_fft, hop, window):
    pad = n_fft // 2
    y_pad = jnp.pad(y, (pad, pad), mode="reflect")
    n_frames = 1 + y.shape[0] // hop
    idx = jnp.arange(n_frames)[:, None] * hop + jnp.arange(n_fft)[None, :]
    frames = y_pad[idx] * window[None, :]
    return jnp.fft.rfft(frames, axis=-1)  # (frames, bins)


def _istft(spec, n_fft, hop, window, n_samples):
    frames = jnp.fft.irfft(spec, n=n_fft, axis=-1) * window[None, :]
    n_frames = spec.shape[0]
    total = n_fft + hop * (n_frames - 1)
    idx = (jnp.arange(n_frames)[:, None] * hop + jnp.arange(n_fft)[None, :]).reshape(-1)
    y = jnp.zeros(total).at[idx].add(frames.reshape(-1))
    wsq = jnp.zeros(total).at[idx].add(jnp.tile(window**2, n_frames))
    y = y / jnp.maximum(wsq, 1e-8)
    pad = n_fft // 2
    return y[pad : pad + n_samples]


@functools.partial(jax.jit, static_argnames=("n_fft", "hop", "n_iter", "n_samples"))
def _griffin_lim(mag_t, window, n_fft, hop, n_iter, n_samples):
    # mag_t: (frames, bins) target magnitude
    def body(_, y):
        spec = _stft(y, n_fft, hop, window)
        phase = spec / jnp.maximum(jnp.abs(spec), 1e-10)
        return _istft(mag_t * phase, n_fft, hop, window, n_samples)

    y0 = _istft(mag_t.astype(jnp.complex64), n_fft, hop, window, n_samples)
    return jax.lax.fori_loop(0, n_iter, body, y0)


def griffin_lim(
    log_mel: jnp.ndarray,  # (n_mels, T)
    sample_rate: int = 22050,
    n_fft: int = 1024,
    hop_length: int = 256,
    win_length: int = 1024,
    fmin: float = 0.0,
    fmax: float = 8000.0,
    n_iter: int = 32,
) -> np.ndarray:
    """Invert a log-mel spectrogram to a waveform (float32, [-1, 1])."""
    mag = mel_to_linear(log_mel, sample_rate, n_fft, fmin, fmax)  # (bins, T)
    window = jnp.asarray(hann_window(win_length))
    if win_length < n_fft:
        lpad = (n_fft - win_length) // 2
        window = jnp.pad(window, (lpad, n_fft - win_length - lpad))
    n_frames = mag.shape[1]
    n_samples = (n_frames - 1) * hop_length
    y = _griffin_lim(mag.T, window, n_fft, hop_length, int(n_iter), int(n_samples))
    y = np.asarray(y)
    peak = np.abs(y).max()
    return (y / peak * 0.95).astype(np.float32) if peak > 0 else y.astype(np.float32)


def write_wav(path, y: np.ndarray, sample_rate: int = 22050) -> None:
    import wave

    with wave.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes((np.clip(y, -1, 1) * 32767).astype("<i2").tobytes())
