import numpy as np

import jax.numpy as jnp

from transformertts_tpu.dsp import mel_spectrogram_np
from transformertts_tpu.dsp.griffin_lim import griffin_lim, mel_to_linear, write_wav

KW = dict(sample_rate=22050, n_fft=1024, hop_length=256, win_length=1024,
          fmin=0.0, fmax=8000.0, n_mels=80)


def test_roundtrip_recovers_tone(tmp_path):
    sr = 22050
    t = np.arange(sr) / sr
    freq = 440.0
    y = (0.8 * np.sin(2 * np.pi * freq * t)).astype(np.float32)
    mel = mel_spectrogram_np(y, **KW)
    rec = griffin_lim(jnp.asarray(mel), n_iter=16)
    assert rec.shape[0] > sr // 2
    # dominant frequency of the reconstruction matches the tone
    spec = np.abs(np.fft.rfft(rec * np.hanning(len(rec))))
    peak_hz = np.fft.rfftfreq(len(rec), 1 / sr)[spec.argmax()]
    assert abs(peak_hz - freq) < 15.0
    write_wav(tmp_path / "x.wav", rec)
    assert (tmp_path / "x.wav").stat().st_size > 1000


def test_mel_to_linear_nonnegative():
    mel = np.random.default_rng(0).standard_normal((80, 50)).astype(np.float32)
    lin = np.asarray(mel_to_linear(jnp.asarray(mel)))
    assert lin.shape == (513, 50)
    assert (lin > 0).all()
