"""High-level synthesis API.

The reference's only inference surface is ``TransformerTTS.inference`` on a
hand-prepared tensor (model/model.py:323).  ``Synthesizer`` packages the
whole pipeline — g2p, bucket padding, KV-cached decode, mel denormalization,
optional Griffin-Lim — behind one object that compiles each bucket size
once and reuses it.
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional

import numpy as np

import jax

from transformertts_tpu.config import Config
from transformertts_tpu.data.dataset import load_stats, pick_bucket
from transformertts_tpu.dsp import denormalize_mel
from transformertts_tpu.infer.decode import make_decode_fn
from transformertts_tpu.models import TransformerTTS
from transformertts_tpu.text import G2p, phonemize


class Synthesizer:
    def __init__(
        self,
        cfg: Config,
        checkpoint_dir: str | Path | None = None,
        variables: Optional[dict] = None,
        stats: Optional[dict] = None,
    ):
        """Provide either a checkpoint dir or ready variables."""
        self.cfg = cfg
        dtype = (
            jax.numpy.bfloat16 if cfg.runtime.compute_dtype == "bfloat16" else jax.numpy.float32
        )
        self.model = TransformerTTS(cfg.model, dtype=dtype)
        self.g2p = G2p()

        if variables is None:
            if checkpoint_dir is None:
                raise ValueError("need checkpoint_dir or variables")
            from transformertts_tpu.train.checkpoint import CheckpointManager
            from transformertts_tpu.train.train_step import create_train_state

            example = {
                "phoneme": np.zeros((1, 1, 16), np.int32),
                "melspec": np.zeros((1, 1, 32, cfg.model.n_mels), np.float32),
                "phoneme_lens": np.full((1, 1), 16, np.int32),
                "melspec_lens": np.full((1, 1), 32, np.int32),
            }
            state = create_train_state(self.model, cfg, jax.random.PRNGKey(0), example)
            state, _ = CheckpointManager(checkpoint_dir).restore(state)
            if state is None:
                raise FileNotFoundError(f"no checkpoint in {checkpoint_dir}")
            variables = {"params": state.eval_params, "batch_stats": state.batch_stats}
        self.variables = variables

        if stats is None and cfg.audio.normalize_mel:
            try:
                stats = load_stats(cfg.path.preprocessed)
            except (FileNotFoundError, OSError):
                stats = None
        self.stats = stats
        self._decoders: dict[int, object] = {}

    def _decode_fn(self, max_len: int):
        if max_len not in self._decoders:
            self._decoders[max_len] = make_decode_fn(self.model, self.cfg, max_len=max_len)
        return self._decoders[max_len]

    def text_to_ids(self, text: str) -> np.ndarray:
        _, seq = phonemize(text, self.g2p)
        return np.asarray(seq, np.int32)

    def warmup(
        self,
        batch_sizes: tuple[int, ...] = (1,),
        buckets: Optional[tuple[int, ...]] = None,
        max_len: Optional[int] = None,
    ) -> int:
        """Pre-compile every decode graph a server will hit.

        jit retraces per (phoneme bucket, batch size) shape, and on TPU a
        cold trace costs seconds to minutes (remote-compile paths pay a
        roundtrip each) — production cold start that otherwise lands on
        the first unlucky request per shape (measured: a 21 s p-max
        latency spike on the first B=8 batch, bench_serving.json).  Runs
        one dummy decode per shape; the decode itself runs to max_len
        (dummy inputs never vote stop), so warmup costs real device
        seconds per shape on top of the compiles — pay it at server
        start, not per request.  Returns the number of graphs warmed.
        """
        buckets = tuple(buckets or self.cfg.runtime.phoneme_buckets)
        decode = self._decode_fn(max_len or self.cfg.runtime.infer_max_len)
        n = 0
        for bucket in buckets:
            for b in batch_sizes:
                phoneme = np.ones((int(b), bucket), np.int32)
                lens = np.full((int(b),), bucket, np.int32)
                jax.device_get(decode(self.variables, phoneme, lens))
                n += 1
        return n

    def synthesize(
        self,
        texts: str | list[str],
        max_len: Optional[int] = None,
        denormalize: bool = True,
    ) -> list[np.ndarray]:
        """Texts -> list of (n_mels, T) mel spectrograms (variable T)."""
        if isinstance(texts, str):
            texts = [texts]
        seqs = [self.text_to_ids(t) for t in texts]
        bucket = pick_bucket(
            max(len(s) for s in seqs), self.cfg.runtime.phoneme_buckets
        ) or self.cfg.runtime.phoneme_buckets[-1]
        b = len(seqs)
        phoneme = np.zeros((b, bucket), np.int32)
        lens = np.zeros((b,), np.int32)
        for i, s in enumerate(seqs):
            s = s[:bucket]
            phoneme[i, : len(s)] = s
            lens[i] = len(s)

        decode = self._decode_fn(max_len or self.cfg.runtime.infer_max_len)
        out = jax.device_get(decode(self.variables, phoneme, lens))
        mels = []
        for i in range(b):
            # per-row usable length: frames up to this row's own stop vote,
            # bounded by the global stop step (the reference's only cut) —
            # trims the trailing babble short utterances pick up in a batch
            n = max(int(out["n_frames_per_row"][i]), 1)
            mel = out["post_melspec"][i, :n].T  # (n_mels, T)
            if denormalize and self.stats is not None:
                mel = denormalize_mel(mel, self.stats["mean"], self.stats["std"])
            mels.append(mel.astype(np.float32))
        return mels

    def stream(
        self,
        text: str,
        chunk: int = 64,
        max_len: Optional[int] = None,
        denormalize: bool = True,
    ):
        """Text -> iterator of (n_mels, <=chunk) mel chunks as they decode.

        Chunks are postnet-final (identical to the one-shot decode's output,
        see infer/streaming.py) and arrive with a latency of at most
        ceil(postnet_overlap/chunk) extra chunks behind the decoder.
        """
        from transformertts_tpu.infer.streaming import stream_decode

        seq = self.text_to_ids(text)
        bucket = pick_bucket(
            len(seq), self.cfg.runtime.phoneme_buckets
        ) or self.cfg.runtime.phoneme_buckets[-1]
        phoneme = np.zeros((1, bucket), np.int32)
        phoneme[0, : min(len(seq), bucket)] = seq[:bucket]
        lens = np.array([min(len(seq), bucket)], np.int32)

        # round capacity up to a whole number of chunks (decode still stops
        # at the stop token; the extra tail is never generated)
        max_len = max_len or self.cfg.runtime.infer_max_len
        max_len = ((max_len + chunk - 1) // chunk) * chunk

        for _, post in stream_decode(
            self.model, self.cfg, self.variables, phoneme, lens,
            max_len=max_len, chunk=chunk,
        ):
            mel = post[0].T  # (n_mels, <=chunk)
            if denormalize and self.stats is not None:
                mel = denormalize_mel(mel, self.stats["mean"], self.stats["std"])
            yield mel.astype(np.float32)

    def synthesize_wav(self, text: str, **kw) -> np.ndarray:
        """Text -> waveform via Griffin-Lim."""
        from transformertts_tpu.dsp.griffin_lim import griffin_lim

        mel = self.synthesize(text, **kw)[0]
        a = self.cfg.audio
        return griffin_lim(
            mel, a.sample_rate, a.n_fft, a.hop_length, a.win_length, a.fmin, a.fmax
        )
