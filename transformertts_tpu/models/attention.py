"""Multi-head attention with torch-MHA-compatible semantics.

Replaces the ATen fused attention the reference reaches through
``nn.TransformerEncoder`` / its custom decoder (ref: model/model.py:197,
model/layers.py:68).  Two compute paths:

- XLA einsum path (default): softmax in fp32, optional per-head weight
  capture for alignment diagnostics / guided-attention loss — matching the
  reference decoder's ``need_weights=True, average_attn_weights=False``
  (ref: model/layers.py:60-70).
- Pallas flash path (``ops/pallas/flash_attention.py``): fused kernel
  (forward, backward, in-kernel PRNG attention dropout); used whenever
  alignment weights aren't requested.

Also exposes the projection submodules separately so the KV-cached decoder
(infer/decode.py) can compute K/V once and reuse them.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from transformertts_tpu.models.initializers import torch_linear_kernel, xavier_uniform


def split_heads(x: jnp.ndarray, n_heads: int) -> jnp.ndarray:
    b, t, d = x.shape
    return x.reshape(b, t, n_heads, d // n_heads)


def merge_heads(x: jnp.ndarray) -> jnp.ndarray:
    b, t, h, dh = x.shape
    return x.reshape(b, t, h * dh)


def dot_product_attention(
    q: jnp.ndarray,  # (B, Tq, H, Dh)
    k: jnp.ndarray,  # (B, Tk, H, Dh)
    v: jnp.ndarray,  # (B, Tk, H, Dh)
    bias: Optional[jnp.ndarray],  # broadcastable to (B, H, Tq, Tk)
    dropout_rate: float = 0.0,
    deterministic: bool = True,
    dropout_rng=None,
    return_weights: bool = False,
):
    dh = q.shape[-1]
    scale = dh ** -0.5
    # scores in fp32 for a stable softmax regardless of compute dtype
    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
    scores = scores * scale
    if bias is not None:
        scores = scores + bias.astype(jnp.float32)
    weights = nn.softmax(scores, axis=-1)
    weights_out = weights if return_weights else None
    if dropout_rate > 0.0 and not deterministic:
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate, weights.shape)
        weights = jnp.where(keep, weights / (1.0 - dropout_rate), 0.0)
    out = jnp.einsum(
        "bhqk,bkhd->bqhd", weights.astype(v.dtype), v, preferred_element_type=jnp.float32
    ).astype(v.dtype)
    return out, weights_out


class MultiHeadAttention(nn.Module):
    """torch nn.MultiheadAttention equivalent (batch_first, same-dim QKV).

    Init matches torch: xavier_uniform in-projections with zero bias;
    out-projection uses torch Linear defaults with zero bias
    (torch MHA._reset_parameters).

    ``use_flash=True`` routes eligible calls (no weight capture, structured
    key-bias/causal masks) through the fused Pallas kernel
    (ops/pallas/flash_attention.py), including training with
    attention-weight dropout (in-kernel PRNG).  Calls passing a raw 4-D
    ``bias`` or requesting weights fall back to the XLA einsum path.
    """

    d_model: int
    n_heads: int
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32
    use_flash: bool = False
    # run the in-projections as ONE matmul (q|k|v for self-attention, k|v
    # for cross) by concatenating the kernels at apply time: the param tree
    # and numerics are unchanged (each output column is computed
    # independently), but the dispatch count drops — the d=256 step is
    # latency-bound (PERF.md), so fewer, wider matmuls win
    fuse_qkv: bool = False

    def setup(self):
        dense = lambda name: nn.Dense(  # noqa: E731
            self.d_model,
            kernel_init=xavier_uniform(),
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name=name,
        )
        self.q_proj = dense("q_proj")
        self.k_proj = dense("k_proj")
        self.v_proj = dense("v_proj")
        self.out_proj = nn.Dense(
            self.d_model,
            kernel_init=torch_linear_kernel(),
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="out_proj",
        )

    def project_kv(self, kv: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
        """K/V projections split into heads — used to prebuild decode caches."""
        k = split_heads(self.k_proj(kv), self.n_heads)
        v = split_heads(self.v_proj(kv), self.n_heads)
        return k, v

    def _fused_in_proj(self, x: jnp.ndarray, names: tuple[str, ...]):
        """One matmul over the column-concatenated projection kernels.

        Equivalent to applying each nn.Dense separately (same promotion
        rules: params and input cast to ``self.dtype``); each output
        column only sees its own kernel column, so results match the
        unfused path.  Params stay under their original submodule names —
        checkpoints and init are untouched.
        """
        p = self.variables["params"]
        w = jnp.concatenate([p[n]["kernel"] for n in names], axis=1)
        b = jnp.concatenate([p[n]["bias"] for n in names], axis=0)
        y = x.astype(self.dtype) @ w.astype(self.dtype) + b.astype(self.dtype)
        return jnp.split(y, len(names), axis=-1)

    def attend(
        self,
        q_in: jnp.ndarray,
        k: jnp.ndarray,
        v: jnp.ndarray,
        bias: Optional[jnp.ndarray] = None,
        train: bool = False,
        return_weights: bool = False,
        key_bias: Optional[jnp.ndarray] = None,  # (B, Tk) additive
        causal: bool = False,
    ):
        """Attention with already-projected K/V (KV-cache path).

        Masking comes either as a raw broadcastable ``bias`` (XLA path only)
        or as structured ``key_bias``+``causal`` (eligible for flash).
        """
        q = split_heads(self.q_proj(q_in), self.n_heads)
        return self._attend_heads(q, k, v, bias, train, return_weights, key_bias, causal)

    def _attend_heads(
        self, q, k, v, bias=None, train=False, return_weights=False,
        key_bias=None, causal=False,
    ):
        dropout_active = self.dropout > 0 and train
        rng = self.make_rng("dropout") if dropout_active else None

        flash_ok = (
            self.use_flash
            and not return_weights
            and bias is None
            and q.shape[1] >= 8
            # off-TPU the kernel runs in interpret mode (correct but slow) —
            # keep CPU training on the XLA path when dropout is active
            and (jax.default_backend() == "tpu" or not dropout_active)
        )
        if flash_ok:
            from transformertts_tpu.ops.pallas.flash_attention import flash_attention

            out = flash_attention(
                q, k, v, key_bias, causal=causal,
                dropout=self.dropout if dropout_active else 0.0,
                dropout_rng=rng,
                interpret=jax.default_backend() != "tpu",
            )
            return self.out_proj(merge_heads(out)), None

        if key_bias is not None or causal:
            from transformertts_tpu.models.masks import causal_bias

            extra = key_bias[:, None, None, :] if key_bias is not None else None
            if causal:
                cb = causal_bias(q.shape[1])
                extra = cb if extra is None else extra + cb
            bias = extra if bias is None else bias + extra
        out, w = dot_product_attention(
            q, k, v, bias, self.dropout, not train, rng, return_weights
        )
        return self.out_proj(merge_heads(out)), w

    def __call__(
        self,
        q_in: jnp.ndarray,
        kv_in: jnp.ndarray,
        bias: Optional[jnp.ndarray] = None,
        train: bool = False,
        return_weights: bool = False,
        key_bias: Optional[jnp.ndarray] = None,
        causal: bool = False,
    ):
        # init must run the real submodules so their params get created
        if self.fuse_qkv and not self.is_initializing():
            if q_in is kv_in:  # self-attention: q|k|v in one matmul
                q, k, v = self._fused_in_proj(q_in, ("q_proj", "k_proj", "v_proj"))
            else:  # cross-attention: k|v fused, q separate
                q = self.q_proj(q_in)
                k, v = self._fused_in_proj(kv_in, ("k_proj", "v_proj"))
            q, k, v = (split_heads(t, self.n_heads) for t in (q, k, v))
            return self._attend_heads(
                q, k, v, bias, train, return_weights, key_bias, causal
            )
        k, v = self.project_kv(kv_in)
        return self.attend(q_in, k, v, bias, train, return_weights, key_bias, causal)
