"""Timing A/B: host-numpy vs batched on-device mel extraction (VERDICT #6).

Generates N LJSpeech-length synthetic clips on the fly (no disk IO in the
timed region, so this measures extraction, not wav reading), then times
 (a) the per-clip numpy path (mel_spectrogram_np — the reference's shape),
 (b) the batched device path used by preprocess when
     runtime.use_pallas_mel=true (_device_mels internals: host reflect pad,
     zero-extend to 32768-sample buckets, fused Pallas kernel on TPU).

Run on the real chip:  python tools/ab_preprocess_mel.py [n_clips]
Writes ab_preprocess_mel.json.
"""

from __future__ import annotations

import pathlib as _pl, sys as _sys
_sys.path.insert(0, str(_pl.Path(__file__).resolve().parent.parent))

import json
import sys
import time

import numpy as np


def main():
    n_clips = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    import jax
    import jax.numpy as jnp

    from transformertts_tpu.config import Config
    from transformertts_tpu.dsp import mel_spectrogram_np
    from transformertts_tpu.ops.pallas.stft import log_mel_pallas
    from transformertts_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    cfg = Config().validate()
    a = cfg.audio
    kw = dict(sample_rate=a.sample_rate, n_fft=a.n_fft, hop_length=a.hop_length,
              win_length=a.win_length, fmin=a.fmin, fmax=a.fmax, n_mels=a.n_mels)
    rng = np.random.default_rng(0)
    # LJSpeech length distribution: mean 6.57 s, std ~2.8 s
    lens = np.clip(rng.normal(6.57, 2.8, n_clips), 1.1, 10.1)
    clips = [(rng.standard_normal(int(s * a.sample_rate)) * 0.3).astype(np.float32)
             for s in lens]
    total_audio_s = float(sum(len(c) for c in clips)) / a.sample_rate

    t0 = time.perf_counter()
    for c in clips:
        mel_np = mel_spectrogram_np(c, **kw)
    numpy_s = time.perf_counter() - t0

    on_tpu = jax.default_backend() == "tpu"
    pad = a.n_fft // 2
    quantum, batch_n = 32768, 32

    def device_pass():
        order = sorted(range(len(clips)), key=lambda i: len(clips[i]))
        out_frames = 0
        for i in range(0, len(order), batch_n):
            chunk = [clips[j] for j in order[i:i + batch_n]]
            max_len = max(len(y) for y in chunk) + 2 * pad
            bucket = -(-max_len // quantum) * quantum
            batch = np.zeros((len(chunk), bucket), np.float32)
            for j, y in enumerate(chunk):
                batch[j, : len(y) + 2 * pad] = np.pad(y, pad, mode="reflect")
            mels = np.asarray(log_mel_pallas(
                jnp.asarray(batch), center=False,
                interpret=not on_tpu, **kw))
            for j, y in enumerate(chunk):
                out_frames += mels[j, :, : 1 + len(y) // a.hop_length].shape[1]
        return out_frames

    device_pass()  # compile all bucket shapes
    t0 = time.perf_counter()
    device_pass()
    device_s = time.perf_counter() - t0

    result = {
        "backend": jax.default_backend(),
        "n_clips": n_clips,
        "total_audio_s": total_audio_s,
        "numpy_s": numpy_s,
        "device_s": device_s,
        "numpy_audio_s_per_s": total_audio_s / numpy_s,
        "device_audio_s_per_s": total_audio_s / device_s,
        "speedup": numpy_s / device_s,
    }
    with open("ab_preprocess_mel.json", "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
