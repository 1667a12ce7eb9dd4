"""Generate mel-spectrogram golden arrays from first principles.

librosa (the reference's DSP dependency, ref: /root/reference/audio.py:27-51)
is not installable in this environment, so exact-librosa goldens cannot be
recorded.  This generator is the next-strongest pin: a COMPLETELY
INDEPENDENT implementation of the same published definitions —

- direct O(N^2) DFT from the definition  X[k] = sum_n x[n] e^{-2 pi i k n / N}
  (pure Python loops + math.cos/sin in float64; no numpy.fft, no scipy),
- reflect padding and periodic-Hann from their definitions,
- Slaney mel filterbank from the published formula (linear < 1 kHz,
  log-spaced above, 2/(f_hi-f_lo) area normalization) built by straight
  triangle construction,
- log(clip(S, 1e-5)) dynamic-range compression,

written without referencing dsp/mel.py's code (which uses rFFT + matmul
framing).  Agreement between two independent implementations of the same
definition pins both; the committed .npz then guards regressions without
any scipy dependency.

Usage: python tools/gen_mel_goldens.py   (writes tests/golden/mel_goldens.npz)
"""

from __future__ import annotations

import pathlib as _pl, sys as _sys
_sys.path.insert(0, str(_pl.Path(__file__).resolve().parent.parent))

import math
import pathlib

import numpy as np

SR = 22050
N_FFT = 1024
HOP = 256
WIN = 1024
N_MELS = 80
FMIN, FMAX = 0.0, 8000.0


def hann_periodic(n: int) -> list[float]:
    return [0.5 - 0.5 * math.cos(2.0 * math.pi * i / n) for i in range(n)]


def reflect_pad(x: list[float], pad: int) -> list[float]:
    # numpy 'reflect' (librosa.stft center=True): mirror WITHOUT the edge
    left = [x[pad - i] for i in range(pad)]
    right = [x[len(x) - 2 - i] for i in range(pad)]
    return left + list(x) + right


def dft_magnitude(frame: list[float]) -> list[float]:
    """|DFT| of one frame, direct from the definition (first N/2+1 bins)."""
    n = len(frame)
    out = []
    for k in range(n // 2 + 1):
        re = 0.0
        im = 0.0
        for i, v in enumerate(frame):
            ang = -2.0 * math.pi * k * i / n
            re += v * math.cos(ang)
            im += v * math.sin(ang)
        out.append(math.sqrt(re * re + im * im))
    return out


def hz_to_mel(f: float) -> float:
    # Slaney auditory toolbox scale (librosa htk=False)
    if f < 1000.0:
        return f * 3.0 / 200.0
    return 15.0 + math.log(f / 1000.0) / (math.log(6.4) / 27.0)


def mel_to_hz(m: float) -> float:
    if m < 15.0:
        return m * 200.0 / 3.0
    return 1000.0 * math.exp((math.log(6.4) / 27.0) * (m - 15.0))


def mel_filterbank() -> list[list[float]]:
    """Triangle filters on mel-spaced points with Slaney area normalization."""
    fft_freqs = [k * SR / N_FFT for k in range(N_FFT // 2 + 1)]
    mel_pts = [
        mel_to_hz(hz_to_mel(FMIN) + (hz_to_mel(FMAX) - hz_to_mel(FMIN)) * i / (N_MELS + 1))
        for i in range(N_MELS + 2)
    ]
    fb = []
    for m in range(N_MELS):
        lo, ctr, hi = mel_pts[m], mel_pts[m + 1], mel_pts[m + 2]
        norm = 2.0 / (hi - lo)
        row = []
        for f in fft_freqs:
            rising = (f - lo) / (ctr - lo) if ctr > lo else 0.0
            falling = (hi - f) / (hi - ctr) if hi > ctr else 0.0
            row.append(max(0.0, min(rising, falling)) * norm)
        fb.append(row)
    return fb


def mel_spectrogram_reference(x: np.ndarray) -> np.ndarray:
    """(n_mels, n_frames) log-mel, entirely from definitions."""
    win = hann_periodic(WIN)
    padded = reflect_pad([float(v) for v in x], N_FFT // 2)
    n_frames = 1 + (len(padded) - N_FFT) // HOP
    fb = mel_filterbank()
    out = [[0.0] * n_frames for _ in range(N_MELS)]
    for t in range(n_frames):
        frame = [padded[t * HOP + i] * win[i] for i in range(N_FFT)]
        mag = dft_magnitude(frame)
        for m in range(N_MELS):
            s = sum(fb[m][k] * mag[k] for k in range(len(mag)))
            out[m][t] = math.log(max(s, 1e-5))
    return np.asarray(out, dtype=np.float64)


def waveforms() -> dict[str, np.ndarray]:
    n = 2048 + 511  # 10 centered frames
    t = np.arange(n) / SR
    rng = np.random.default_rng(12345)
    return {
        # harmonic stack: exercises sharp spectral peaks across mel bands
        "harmonic": (0.6 * np.sin(2 * np.pi * 220 * t)
                     + 0.3 * np.sin(2 * np.pi * 880 * t)
                     + 0.15 * np.sin(2 * np.pi * 3520 * t)).astype(np.float64),
        # chirp: every frame has different content (catches framing offsets)
        "chirp": np.sin(2 * np.pi * (100 + 4000 * t / t[-1]) * t).astype(np.float64),
        # noise: broadband, catches filterbank normalization errors
        "noise": (rng.standard_normal(n) * 0.3).astype(np.float64),
    }


def main() -> None:
    out = {}
    for name, x in waveforms().items():
        out[f"{name}_wave"] = x
        out[f"{name}_logmel"] = mel_spectrogram_reference(x)
        print(f"{name}: logmel {out[f'{name}_logmel'].shape} "
              f"range [{out[f'{name}_logmel'].min():.3f}, {out[f'{name}_logmel'].max():.3f}]")
    path = pathlib.Path(__file__).resolve().parent.parent / "tests" / "golden" / "mel_goldens.npz"
    np.savez_compressed(path, **out)
    print("wrote", path)


if __name__ == "__main__":
    main()
