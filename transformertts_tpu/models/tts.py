"""The flagship TransformerTTS model (ref: model/model.py:138-394).

Teacher-forced forward returns the same four outputs as the reference —
pre-postnet mel, post-postnet mel (residual add), stop logits, per-layer
cross-attention alignments — with static shapes throughout so the whole
step jits onto the MXU.  Autoregressive decoding lives in
``infer/decode.py`` (KV-cached ``lax.while_loop``; the reference re-runs
the full decoder per frame, model/model.py:354-374).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from transformertts_tpu.config import ModelConfig
from transformertts_tpu.models.masks import key_padding_bias
from transformertts_tpu.models.modules import (
    DecoderPreNet,
    EncoderPreNet,
    LinearNorm,
    PostNet,
    ScaledPositionalEncoding,
)
from transformertts_tpu.models.transformer import Decoder, Encoder


def shift_right(mel: jnp.ndarray, r: int = 1) -> jnp.ndarray:
    """Decoder inputs: zero go-frame then the last frame of each previous
    group of ``r`` frames (ref r=1 case: model/model.py:278-279).

    Output has T/r positions; for r=1 this is the classic shift-right.
    """
    go = jnp.zeros_like(mel[:, :1, :])
    prev_last = mel[:, r - 1 :: r, :][:, :-1, :]  # frames r-1, 2r-1, ... (drop last)
    return jnp.concatenate([go, prev_last], axis=1)


def group_lens(mel_lens: jnp.ndarray, r: int) -> jnp.ndarray:
    """Frame lengths -> decoder-position lengths (ceil divide)."""
    return (mel_lens + r - 1) // r if r > 1 else mel_lens


class TransformerTTS(nn.Module):
    cfg: ModelConfig
    dtype: jnp.dtype = jnp.float32
    use_flash: bool = False  # fused Pallas attention (runtime.use_pallas_attention)
    use_fused_ln: bool = False  # fused residual+dropout+LN (runtime.use_pallas_fused_ln)
    use_fused_ffn: bool = False  # fused Pallas FFN (runtime.use_pallas_fused_ffn)
    fuse_qkv: bool = False  # one-matmul in-projections (runtime.fuse_qkv_projections)

    def setup(self):
        c = self.cfg
        self.emb = nn.Embed(
            c.n_phon, c.d_model,
            embedding_init=nn.initializers.normal(1.0),  # torch nn.Embedding N(0,1)
            param_dtype=jnp.float32,
            name="emb",
        )
        self.enc_prenet = EncoderPreNet(
            c.encoder_prenet_n_layers, c.d_model, c.encoder_prenet_kernel_size,
            c.encoder_prenet_dropout, self.dtype,
        )
        self.dec_prenet = DecoderPreNet(c.d_model, c.decoder_prenet_dropout, self.dtype)
        # ONE shared PE module (shared alpha), used for both sides —
        # reference quirk kept (ref: model/model.py:184-186, 288, 297).
        self.pe = ScaledPositionalEncoding(
            c.d_model, c.pe_dropout, c.max_len, self.dtype
        )
        self.encoder = Encoder(
            c.encoder_n_layers, c.d_model, c.encoder_n_head, c.encoder_d_ffn,
            c.encoder_dropout, self.dtype, self.use_flash, self.use_fused_ln,
            self.use_fused_ffn, self.fuse_qkv,
        )
        self.decoder = Decoder(
            c.decoder_n_layers, c.d_model, c.decoder_n_head, c.decoder_d_ffn,
            c.decoder_dropout, self.dtype, self.use_flash, self.use_fused_ln,
            self.use_fused_ffn, self.fuse_qkv,
        )
        self.postnet = PostNet(
            c.postnet_n_layers, c.n_mels, c.d_model, c.postnet_kernel_size,
            c.postnet_dropout, self.dtype,
        )
        # heads emit reduction_factor frames / stop logits per decoder
        # position (r=1 == reference linear1/linear2 exactly)
        r = c.reduction_factor
        self.mel_linear = LinearNorm(c.n_mels * r, dtype=self.dtype)  # ref linear1
        self.stop_linear = LinearNorm(r, dtype=self.dtype)  # ref linear2

    def encode(
        self,
        phoneme: jnp.ndarray,  # (B, T_phon) int32
        phoneme_lens: Optional[jnp.ndarray],  # (B,) or None => no padding mask
        train: bool = False,
    ) -> jnp.ndarray:
        src_key_bias = (
            key_padding_bias(phoneme_lens, phoneme.shape[1])
            if phoneme_lens is not None else None
        )
        x = self.emb(phoneme).astype(self.dtype)
        x = self.pe(self.enc_prenet(x, train), train)
        return self.encoder(x, src_key_bias, train)

    def decode(
        self,
        memory: jnp.ndarray,  # (B, T_phon, D)
        tgt_in: jnp.ndarray,  # (B, T_mel, n_mels) shifted-right mel
        phoneme_lens: Optional[jnp.ndarray],
        mel_lens: Optional[jnp.ndarray],
        train: bool = False,
        return_alignments: bool = True,
    ):
        t_pos = tgt_in.shape[1]  # decoder positions (frames / reduction_factor)
        tgt_key_bias = (
            key_padding_bias(group_lens(mel_lens, self.cfg.reduction_factor), t_pos)
            if mel_lens is not None else None
        )
        mem_key_bias = (
            key_padding_bias(phoneme_lens, memory.shape[1])
            if phoneme_lens is not None else None
        )
        x = self.pe(self.dec_prenet(tgt_in.astype(self.dtype), train), train)
        return self.decoder(x, memory, tgt_key_bias, mem_key_bias, train, return_alignments)

    def __call__(
        self,
        phoneme: jnp.ndarray,
        melspec: jnp.ndarray,
        phoneme_lens: jnp.ndarray,
        melspec_lens: jnp.ndarray,
        train: bool = False,
        return_alignments: bool = True,
        compute_postnet: bool = True,
    ) -> dict:
        """Teacher-forced forward (ref: model/model.py:260-320).

        ``compute_postnet=False`` skips the postnet (used by the first,
        gradient-free scheduled-sampling pass, which only needs
        ``pred_melspec`` — lightning_module.py:53-59 computes it anyway).
        """
        r = self.cfg.reduction_factor
        b, t_mel = melspec.shape[0], melspec.shape[1]
        if t_mel % r:
            raise ValueError(f"mel length {t_mel} not a multiple of reduction_factor {r}")
        tgt_in = shift_right(melspec, r)
        memory = self.encode(phoneme, phoneme_lens, train)
        tgt_out, alignments = self.decode(
            memory, tgt_in, phoneme_lens, melspec_lens, train, return_alignments
        )
        # (B, T/r, r*C) -> (B, T, C); (B, T/r, r) -> (B, T)
        pred_melspec = self.mel_linear(tgt_out).reshape(b, t_mel, self.cfg.n_mels)
        pred_stop = self.stop_linear(tgt_out).reshape(b, t_mel)
        out = {
            "pred_melspec": pred_melspec.astype(jnp.float32),
            "pred_stop": pred_stop.astype(jnp.float32),
        }
        if compute_postnet:
            post_melspec = self.postnet(pred_melspec, train) + pred_melspec
            out["post_melspec"] = post_melspec.astype(jnp.float32)
        if return_alignments:
            out["alignments"] = alignments.astype(jnp.float32)
        return out

    # --- hooks used by infer/decode.py through nn.apply(method=...) ---

    def prenet_step(self, frame: jnp.ndarray, step: jnp.ndarray) -> jnp.ndarray:
        """Decoder prenet + positional encoding for one input frame at
        decoder position `step` (group index when reduction_factor > 1)."""
        x = self.dec_prenet(frame.astype(self.dtype), False)
        return self.pe(x, False, offset=step)

    def build_cross_cache(self, memory: jnp.ndarray):
        return [layer.project_cross_kv(memory) for layer in self.decoder.layers]

    def decode_frame_heads(self, x: jnp.ndarray):
        """Final projections for decoded hidden positions (B, k, d_model).

        Returns mel frames (B, k*r, n_mels) and stop logits (B, k*r) —
        each of the k positions emits reduction_factor frames (the usual
        decode step passes k=1; the speculative chunk passes k>1).
        """
        b = x.shape[0]
        mel = self.mel_linear(x).reshape(b, -1, self.cfg.n_mels)
        stop = self.stop_linear(x).reshape(b, -1)
        return mel, stop

    def apply_postnet(self, mel: jnp.ndarray) -> jnp.ndarray:
        return self.postnet(mel, False) + mel
