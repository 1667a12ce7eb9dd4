"""Post-LN Transformer encoder/decoder stacks.

Semantics mirror torch's ``TransformerEncoderLayer`` (norm_first=False,
activation=relu) used by the reference (ref: model/model.py:189-200) and its
custom decoder whose only delta is returning per-layer cross-attention
weights (ref: model/layers.py:7-110):

  encoder layer:  x = LN1(x + Drop(SelfAttn(x)))
                  x = LN2(x + Drop(W2 Drop(relu(W1 x))))
  decoder layer:  x = LN1(x + Drop(SelfAttn(x, causal+pad)))
                  x = LN2(x + Drop(CrossAttn(x, memory, mem-pad)))  [weights kept]
                  x = LN3(x + Drop(FFN(x)))

FFN linears use torch nn.Linear default init; LayerNorm eps = 1e-5 (torch).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from transformertts_tpu.models.attention import MultiHeadAttention
from transformertts_tpu.models.initializers import torch_linear_bias, torch_linear_kernel


def _residual_norm(layer, norm, drop, x, h, train: bool):
    """``norm(x + drop(h))`` — optionally as one fused Pallas pass.

    The fused path (ops/pallas/fused_ln.py) reads the LayerNorm params off
    the bound submodule so the parameter tree (and checkpoints) are
    identical either way; init always runs the plain path to create them.
    """
    dropout_active = layer.dropout > 0 and train
    on_tpu = jax.default_backend() == "tpu"
    # off-TPU the kernel runs in interpret mode (correct but slow) — keep
    # CPU training on the plain path whenever dropout would be needed
    fused_ok = layer.use_fused_ln and (on_tpu or not dropout_active)
    if fused_ok and not layer.is_initializing():
        from transformertts_tpu.ops.pallas.fused_ln import residual_dropout_layernorm

        return residual_dropout_layernorm(
            x,
            h,
            norm.variables["params"]["scale"],
            norm.variables["params"]["bias"],
            dropout=layer.dropout if dropout_active else 0.0,
            dropout_rng=layer.make_rng("dropout") if dropout_active else None,
            interpret=not on_tpu,
        )
    return norm(x + drop(h, deterministic=not train))


class FeedForward(nn.Module):
    d_model: int
    d_ffn: int
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32
    use_fused: bool = False  # fused Pallas FFN (runtime.use_pallas_fused_ffn)

    @nn.compact
    def __call__(self, x, train: bool = False):
        dropout_active = self.dropout > 0 and train
        on_tpu = jax.default_backend() == "tpu"
        # same gating as _residual_norm: init runs the plain path to create
        # the (identically named) Dense_0/Dense_1 params; off-TPU interpret
        # mode is correct but slow, so fall back when dropout is active
        fused_ok = self.use_fused and (on_tpu or not dropout_active)
        if fused_ok and not self.is_initializing():
            from transformertts_tpu.ops.pallas.fused_ffn import fused_ffn

            p = self.variables["params"]
            return fused_ffn(
                x,
                p["Dense_0"]["kernel"], p["Dense_0"]["bias"],
                p["Dense_1"]["kernel"], p["Dense_1"]["bias"],
                dropout=self.dropout if dropout_active else 0.0,
                dropout_rng=self.make_rng("dropout") if dropout_active else None,
                interpret=not on_tpu,
            )
        h = nn.Dense(
            self.d_ffn,
            kernel_init=torch_linear_kernel(),
            bias_init=torch_linear_bias(self.d_model),
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )(x)
        h = nn.Dropout(self.dropout, deterministic=not train)(nn.relu(h))
        h = nn.Dense(
            self.d_model,
            kernel_init=torch_linear_kernel(),
            bias_init=torch_linear_bias(self.d_ffn),
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )(h)
        return h


def _layer_norm(dtype, name):
    return nn.LayerNorm(epsilon=1e-5, dtype=dtype, param_dtype=jnp.float32, name=name)


class EncoderLayer(nn.Module):
    d_model: int
    n_heads: int
    d_ffn: int
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32
    use_flash: bool = False
    use_fused_ln: bool = False
    use_fused_ffn: bool = False
    fuse_qkv: bool = False

    def setup(self):
        self.self_attn = MultiHeadAttention(
            self.d_model, self.n_heads, self.dropout, self.dtype, self.use_flash,
            self.fuse_qkv,
        )
        self.ffn = FeedForward(self.d_model, self.d_ffn, self.dropout, self.dtype, self.use_fused_ffn)
        self.norm1 = _layer_norm(self.dtype, "norm1")
        self.norm2 = _layer_norm(self.dtype, "norm2")
        self.drop1 = nn.Dropout(self.dropout)
        self.drop2 = nn.Dropout(self.dropout)

    def __call__(self, x, key_bias=None, train: bool = False):
        sa, _ = self.self_attn(x, x, None, train, key_bias=key_bias)
        x = _residual_norm(self, self.norm1, self.drop1, x, sa, train)
        ff = self.ffn(x, train)
        x = _residual_norm(self, self.norm2, self.drop2, x, ff, train)
        return x


class Encoder(nn.Module):
    n_layers: int
    d_model: int
    n_heads: int
    d_ffn: int
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32
    use_flash: bool = False
    use_fused_ln: bool = False
    use_fused_ffn: bool = False
    fuse_qkv: bool = False

    @nn.compact
    def __call__(self, x, key_bias=None, train: bool = False):
        for i in range(self.n_layers):
            x = EncoderLayer(
                self.d_model, self.n_heads, self.d_ffn, self.dropout, self.dtype,
                self.use_flash, self.use_fused_ln, self.use_fused_ffn,
                self.fuse_qkv, name=f"layer_{i}",
            )(x, key_bias, train)
        return x


class DecoderLayer(nn.Module):
    d_model: int
    n_heads: int
    d_ffn: int
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32
    use_flash: bool = False
    use_fused_ln: bool = False
    use_fused_ffn: bool = False
    fuse_qkv: bool = False

    def setup(self):
        self.self_attn = MultiHeadAttention(
            self.d_model, self.n_heads, self.dropout, self.dtype, self.use_flash,
            self.fuse_qkv,
        )
        self.cross_attn = MultiHeadAttention(
            self.d_model, self.n_heads, self.dropout, self.dtype, self.use_flash,
            self.fuse_qkv,
        )
        self.ffn = FeedForward(self.d_model, self.d_ffn, self.dropout, self.dtype, self.use_fused_ffn)
        self.norm1 = _layer_norm(self.dtype, "norm1")
        self.norm2 = _layer_norm(self.dtype, "norm2")
        self.norm3 = _layer_norm(self.dtype, "norm3")
        self.drop1 = nn.Dropout(self.dropout)
        self.drop2 = nn.Dropout(self.dropout)
        self.drop3 = nn.Dropout(self.dropout)

    def __call__(
        self,
        x,
        memory,
        tgt_key_bias=None,
        mem_key_bias=None,
        train: bool = False,
        return_alignments: bool = True,
    ):
        sa, _ = self.self_attn(x, x, None, train, key_bias=tgt_key_bias, causal=True)
        x = _residual_norm(self, self.norm1, self.drop1, x, sa, train)
        ca, align = self.cross_attn(
            x, memory, None, train, return_weights=return_alignments,
            key_bias=mem_key_bias,
        )
        x = _residual_norm(self, self.norm2, self.drop2, x, ca, train)
        ff = self.ffn(x, train)
        x = _residual_norm(self, self.norm3, self.drop3, x, ff, train)
        return x, align

    # --- KV-cached single/multi-step path (infer/decode.py) ---

    def cached_step(self, x, self_k, self_v, cross_k, cross_v, self_bias, cross_bias):
        """One decode step with precomputed K/V (no dropout: inference)."""
        sa, _ = self.self_attn.attend(x, self_k, self_v, self_bias)
        x = self.norm1(x + sa)
        ca, _ = self.cross_attn.attend(x, cross_k, cross_v, cross_bias)
        x = self.norm2(x + ca)
        x = self.norm3(x + self.ffn(x))
        return x

    def cached_step_attn(
        self, x, self_k, self_v, cross_k, cross_v, self_bias, cross_bias
    ):
        """cached_step that also returns the cross-attention probs
        (B, H, 1, Tp) — used by the windowed monotonic decode to track the
        attention position (infer/decode.py, runtime.decode_attn_window)."""
        sa, _ = self.self_attn.attend(x, self_k, self_v, self_bias)
        x = self.norm1(x + sa)
        ca, w = self.cross_attn.attend(
            x, cross_k, cross_v, cross_bias, return_weights=True
        )
        x = self.norm2(x + ca)
        x = self.norm3(x + self.ffn(x))
        return x, w

    def project_self_kv(self, x):
        return self.self_attn.project_kv(x)

    def project_cross_kv(self, memory):
        return self.cross_attn.project_kv(memory)


class Decoder(nn.Module):
    n_layers: int
    d_model: int
    n_heads: int
    d_ffn: int
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32
    use_flash: bool = False
    use_fused_ln: bool = False
    use_fused_ffn: bool = False
    fuse_qkv: bool = False

    def setup(self):
        self.layers = [
            DecoderLayer(
                self.d_model, self.n_heads, self.d_ffn, self.dropout, self.dtype,
                self.use_flash, self.use_fused_ln, self.use_fused_ffn,
                self.fuse_qkv, name=f"layer_{i}",
            )
            for i in range(self.n_layers)
        ]

    def __call__(
        self,
        x,
        memory,
        tgt_key_bias=None,
        mem_key_bias=None,
        train: bool = False,
        return_alignments: bool = True,
    ):
        alignments = []
        for layer in self.layers:
            x, align = layer(x, memory, tgt_key_bias, mem_key_bias, train, return_alignments)
            if return_alignments:
                alignments.append(align)
        # (L, B, H, T_mel, T_phon) stacked — reference returns a Python list
        # per layer (model/layers.py:104-110); a stacked array is jit-friendly.
        out_align = jnp.stack(alignments) if return_alignments else None
        return x, out_align
