"""Offline preprocessing CLI (ref: preprocess.py).

``python -m transformertts_tpu.data.preprocess --config config.yaml``

Pipeline per utterance (ref: preprocess.py:28-42):
  metadata.csv (``id|raw|normalized``) -> g2p phonemes + id sequence,
  wav -> log-mel ``(n_mels, T)`` -> global mean/std normalize -> ``<id>.npz``
  with keys melspec / transcript / phoneme / sequence.

Global scalar mel stats are streamed over the corpus first and written to
``stats.json`` in the preprocessed dir (ref: preprocess.py:45-72 writes to
CWD; we keep it next to the data).  Skips entirely if the output dir is
non-empty (ref: preprocess.py:80-82); per-utterance errors warn + continue
(ref: preprocess.py:97-100).
"""

from __future__ import annotations

import argparse
import json
import logging
from pathlib import Path

import numpy as np

from transformertts_tpu.config import Config, load_config
from transformertts_tpu.data.audio_io import load_wav
from transformertts_tpu.dsp import mel_spectrogram_np, normalize_mel
from transformertts_tpu.text import G2p, phonemize

log = logging.getLogger("transformertts_tpu.preprocess")


def load_transcripts(metadata_path: Path) -> dict[str, str]:
    """``id|raw|normalized`` -> {id: normalized} (ref: preprocess.py:11-18)."""
    transcripts: dict[str, str] = {}
    with open(metadata_path, encoding="utf-8") as f:
        for line in f:
            parts = line.strip().split("|")
            if len(parts) < 3:
                continue
            transcripts[parts[0]] = parts[2].strip()
    log.info("Loaded %d transcripts", len(transcripts))
    return transcripts


def _mel_for(audio_id: str, cfg: Config) -> np.ndarray:
    wav_path = Path(cfg.path.data) / "wavs" / f"{audio_id}.wav"
    y, _ = load_wav(wav_path, cfg.audio.sample_rate)
    a = cfg.audio
    return mel_spectrogram_np(
        y, a.sample_rate, a.n_fft, a.hop_length, a.win_length, a.fmin, a.fmax, a.n_mels
    )


# bucket granularity for the batched device path: wavs are zero-extended to
# the next multiple of this, so each (batch, padded-len) shape compiles once
_DEVICE_MEL_BATCH = 32
_DEVICE_LEN_QUANTUM = 32768  # ~1.5 s of 22.05 kHz audio


def _device_mels(ids: list[str], cfg: Config):
    """Yield (audio_id, log-mel) via BATCHED on-device extraction.

    TPU redesign of the reference's one-clip-at-a-time librosa loop
    (ref: preprocess.py:96-100): clips are sorted by length, reflect-padded
    individually on the host (so the final frames see the true signal, not
    a batch zero-extension), zero-extended to a quantized bucket length,
    and processed _DEVICE_MEL_BATCH at a time by the fused Pallas
    STFT->mel kernel (XLA rFFT path off-TPU).  Frame counts are exact:
    each result is sliced to the clip's true 1 + n // hop frames.
    """
    import wave as wave_mod

    import jax
    import jax.numpy as jnp

    from transformertts_tpu.ops.pallas.stft import log_mel_pallas

    a = cfg.audio
    pad = a.n_fft // 2
    on_tpu = jax.default_backend() == "tpu"

    # sort by length WITHOUT loading audio (wav header only), then stream
    # one batch of wavs at a time — full-corpus residency would be ~8 GB
    # on LJSpeech
    def _header_len(audio_id: str) -> int | None:
        try:
            with wave_mod.open(
                str(Path(cfg.path.data) / "wavs" / f"{audio_id}.wav"), "rb"
            ) as f:
                return int(f.getnframes() * a.sample_rate / f.getframerate())
        except Exception as e:  # noqa: BLE001
            log.warning("mel: skipping %s (header): %s", audio_id, e)
            return None

    with_len = [(i, n) for i in ids if (n := _header_len(i)) is not None]
    with_len.sort(key=lambda t: t[1])
    order = [i for i, _ in with_len]

    def _load_chunk(chunk_ids: list[str]) -> list[tuple[str, np.ndarray]]:
        out = []
        for audio_id in chunk_ids:
            try:
                y, _ = load_wav(
                    Path(cfg.path.data) / "wavs" / f"{audio_id}.wav",
                    a.sample_rate,
                )
                if len(y) == 0:
                    raise ValueError("empty audio")
                out.append((audio_id, y))
            except Exception as e:  # noqa: BLE001
                log.warning("mel: skipping %s: %s", audio_id, e)
        return out

    for i in range(0, len(order), _DEVICE_MEL_BATCH):
        chunk = _load_chunk(order[i:i + _DEVICE_MEL_BATCH])
        if not chunk:
            continue
        try:
            max_len = max(len(y) for _, y in chunk) + 2 * pad
            bucket = -(-max_len // _DEVICE_LEN_QUANTUM) * _DEVICE_LEN_QUANTUM
            batch = np.zeros((len(chunk), bucket), np.float32)
            for j, (_, y) in enumerate(chunk):
                batch[j, : len(y) + 2 * pad] = np.pad(y, pad, mode="reflect")
            if on_tpu:
                mels = np.asarray(
                    log_mel_pallas(
                        jnp.asarray(batch), a.sample_rate, a.n_fft, a.hop_length,
                        a.win_length, a.fmin, a.fmax, a.n_mels, center=False,
                    )
                )
            else:  # XLA rFFT path — interpret-mode Pallas would be far slower
                from transformertts_tpu.dsp import mel_spectrogram_jax

                mels = np.asarray(
                    mel_spectrogram_jax(
                        jnp.asarray(batch), a.sample_rate, a.n_fft, a.hop_length,
                        a.win_length, a.fmin, a.fmax, a.n_mels, center=False,
                    )
                )
        except Exception as e:  # noqa: BLE001  (per-chunk tolerance, ref preprocess.py:97-100)
            log.warning("mel: skipping chunk of %d clips (%s..): %s",
                        len(chunk), chunk[0][0], e)
            continue
        for j, (audio_id, y) in enumerate(chunk):
            n_frames = 1 + len(y) // a.hop_length
            yield audio_id, mels[j, :, :n_frames]


def _mels_iter(ids: list[str], cfg: Config):
    """(audio_id, mel) pairs via the configured extraction path, with the
    reference's per-utterance error tolerance (ref: preprocess.py:97-100)."""
    if cfg.runtime.use_pallas_mel:
        yield from _device_mels(ids, cfg)
        return
    for audio_id in ids:
        try:
            yield audio_id, _mel_for(audio_id, cfg)
        except Exception as e:  # noqa: BLE001
            log.warning("mel: skipping %s: %s", audio_id, e)


def compute_global_stats(transcripts: dict[str, str], cfg: Config, out_dir: Path):
    """Streamed corpus mean/std (ref: preprocess.py:45-72)."""
    total, sq_total, count = 0.0, 0.0, 0
    for _audio_id, mel in _mels_iter(list(transcripts), cfg):
        count += mel.size
        total += float(mel.sum())
        sq_total += float((mel.astype(np.float64) ** 2).sum())
    mean = total / count
    std = float(np.sqrt(sq_total / count - mean**2 + 1e-8))
    stats = {"mean": mean, "std": std}
    with open(out_dir / "stats.json", "w", encoding="utf-8") as f:
        json.dump(stats, f, indent=2)
    log.info("Global mel stats: mean=%.4f std=%.4f", mean, std)
    return mean, std


def process_and_save(audio_id, transcript, g2p, cfg, out_dir: Path, mean, std,
                     mel: np.ndarray | None = None):
    phoneme, sequence = phonemize(transcript, g2p)
    if mel is None:
        mel = _mel_for(audio_id, cfg)
    if mean is not None and std is not None:
        mel = normalize_mel(mel, mean, std)
    np.savez(
        out_dir / f"{audio_id}.npz",
        melspec=mel.astype(np.float32),
        transcript=transcript,
        phoneme=np.array(phoneme),
        sequence=np.array(sequence, dtype=np.int32),
    )


def preprocess(cfg: Config) -> None:
    out_dir = Path(cfg.path.preprocessed)
    out_dir.mkdir(parents=True, exist_ok=True)
    if any(out_dir.iterdir()):
        log.info("Preprocessed data already exists. Skipping.")
        return

    metadata = Path(cfg.path.data) / "metadata.csv"
    if not metadata.is_file():
        log.error("Metadata file not found at %s", metadata)
        return

    transcripts = load_transcripts(metadata)
    g2p = G2p()
    log.info("g2p backend: %s", g2p.backend)

    mean = std = None
    if cfg.audio.normalize_mel:
        mean, std = compute_global_stats(transcripts, cfg, out_dir)

    n_done = 0
    for audio_id, mel in _mels_iter(list(transcripts), cfg):
        try:
            process_and_save(
                audio_id, transcripts[audio_id], g2p, cfg, out_dir, mean, std,
                mel=mel,
            )
            n_done += 1
        except Exception as e:  # noqa: BLE001
            log.warning("Error processing %s: %s", audio_id, e)
    log.info("Preprocessing done (%d errors)", len(transcripts) - n_done)


def main(argv=None):
    logging.basicConfig(level=logging.INFO)
    ap = argparse.ArgumentParser(description="Offline LJSpeech preprocessing")
    ap.add_argument("--config", default=None)
    ap.add_argument("--set", action="append", default=[], dest="overrides",
                    help="dotted config override, e.g. path.data=/data/LJSpeech-1.1")
    args = ap.parse_args(argv)
    preprocess(load_config(args.config, args.overrides))


if __name__ == "__main__":
    main()
