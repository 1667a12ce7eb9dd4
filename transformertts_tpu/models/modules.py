"""Building-block modules: LinearNorm, ConvBN, prenets, postnet, scaled PE.

Behavioral parity notes vs the reference:
- ``ConvBN`` == ConvNormBN (ref: model/module.py:4-33): conv (same-pad) +
  BatchNorm, *no* nonlinearity inside — the ``activation`` argument only
  selects the Xavier init gain.  Here convs run feature-last natively
  ((B, T, C)), no permutes — XLA lowers to MXU-tiled convolution directly.
- ``EncoderPreNet`` (ref: model/model.py:13-45): N x [ConvBN + Dropout],
  then LinearNorm.  No ReLU anywhere (reference quirk, kept).
- ``DecoderPreNet`` (ref: model/model.py:48-67): 2 x [LinearNorm -> ReLU ->
  Dropout]; dropout disabled at inference (unlike Tacotron-style prenets).
- ``PostNet`` (ref: model/model.py:100-135): first/middle ConvBN blocks are
  followed by an explicit Tanh, the last one is linear; residual add happens
  in the caller.
- ``ScaledPositionalEncoding`` (ref: model/model.py:70-97): sinusoidal table
  with ONE learnable scalar alpha; the reference shares a single module
  (alpha + dropout) between encoder and decoder (model/model.py:288,297) —
  mirrored by instantiating this once and calling it twice.
- BatchNorm uses torch hyperparameters (momentum 0.1 torch == 0.9 flax,
  eps 1e-5).  Under pjit with a sharded batch the mean/var reductions are
  global (XLA inserts the cross-device collectives), matching single-device
  semantics.
"""

from __future__ import annotations

import math

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from transformertts_tpu.models.initializers import xavier_normal


class LinearNorm(nn.Module):
    """Dense with torch xavier_normal(gain(activation)) init, zero bias."""

    features: int
    use_bias: bool = True
    activation: str = "relu"  # init gain only (ref: model/module.py:36-53)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.Dense(
            self.features,
            use_bias=self.use_bias,
            kernel_init=xavier_normal(self.activation),
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )(x)


class ConvBN(nn.Module):
    """Same-padded Conv1d + BatchNorm, feature-last. No activation inside."""

    features: int
    kernel_size: int
    activation: str = "relu"  # init gain only (ref: model/module.py:21)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = (self.kernel_size - 1) // 2
        x = nn.Conv(
            self.features,
            kernel_size=(self.kernel_size,),
            padding=[(pad, pad)],
            kernel_init=xavier_normal(self.activation),
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )(x)
        return x


class EncoderPreNet(nn.Module):
    """N x [ConvBN + Dropout] + final LinearNorm (ref: model/model.py:13-45)."""

    n_layers: int
    features: int
    kernel_size: int
    dropout: float = 0.5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        for _ in range(self.n_layers):
            x = ConvBN(self.features, self.kernel_size, "relu", self.dtype)(x, train)
            x = nn.Dropout(self.dropout, deterministic=not train)(x)
        x = LinearNorm(self.features, dtype=self.dtype)(x)
        return x


class DecoderPreNet(nn.Module):
    """2 x [LinearNorm -> ReLU -> Dropout] (ref: model/model.py:48-67)."""

    d_model: int
    dropout: float = 0.5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.relu(LinearNorm(self.d_model, dtype=self.dtype)(x))
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        x = nn.relu(LinearNorm(self.d_model, dtype=self.dtype)(x))
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return x


def sinusoid_table(max_len: int, d_model: int) -> np.ndarray:
    """Standard sinusoidal PE table (ref: model/model.py:80-85)."""
    position = np.arange(max_len, dtype=np.float64)[:, None]
    div_term = np.exp(np.arange(0, d_model, 2, dtype=np.float64) * (-math.log(10000.0) / d_model))
    pe = np.zeros((max_len, d_model), dtype=np.float64)
    pe[:, 0::2] = np.sin(position * div_term)
    pe[:, 1::2] = np.cos(position * div_term)
    return pe.astype(np.float32)


class ScaledPositionalEncoding(nn.Module):
    """x + alpha * PE[:T] then dropout; alpha is one learnable scalar."""

    d_model: int
    dropout: float = 0.1
    max_len: int = 5000
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.alpha = self.param("alpha", nn.initializers.ones, (1,), jnp.float32)
        self.pe = jnp.asarray(sinusoid_table(self.max_len, self.d_model))
        # submodule (not inline): this module is invoked twice (enc + dec)
        self.drop = nn.Dropout(self.dropout)

    def __call__(self, x, train: bool = False, offset: int | jnp.ndarray = 0):
        t = x.shape[-2]
        if isinstance(offset, int) and offset == 0:
            table = self.pe[:t]
        else:
            # decode-step path: single frame at dynamic position `offset`
            table = jax.lax.dynamic_slice_in_dim(self.pe, offset, t, axis=0)
        x = x + (self.alpha * table[None]).astype(x.dtype)
        return self.drop(x, deterministic=not train)


class PostNet(nn.Module):
    """5-layer conv postnet; residual add happens in the caller.

    Layer 1: ConvBN(n_mels->d) + Tanh + Drop; middle: ConvBN(d->d) + Tanh +
    Drop; last: ConvBN(d->n_mels) (tanh init gain, no Tanh) + Drop.
    (ref: model/model.py:100-135)
    """

    n_layers: int
    n_mels: int
    d_model: int
    kernel_size: int
    dropout: float = 0.5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        drop = lambda y: nn.Dropout(self.dropout, deterministic=not train)(y)  # noqa: E731
        for _ in range(self.n_layers - 1):
            x = ConvBN(self.d_model, self.kernel_size, "tanh", self.dtype)(x, train)
            x = drop(jnp.tanh(x))
        x = ConvBN(self.n_mels, self.kernel_size, "tanh", self.dtype)(x, train)
        x = drop(x)
        return x
