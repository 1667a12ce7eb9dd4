"""Weight initializers reproducing the reference's torch init semantics.

The reference initializes LinearNorm / ConvNormBN with
``nn.init.xavier_normal_(w, gain=calculate_gain(activation))`` and zero bias
(ref: model/module.py:21-26, 47-50); its stock torch layers use torch's
defaults (kaiming-uniform a=sqrt(5) for Linear, xavier-uniform for MHA
in-projections, N(0,1) for Embedding).

All fan computations follow torch's convention (fan_in/fan_out include the
kernel's receptive field), mapped onto flax kernel layouts:
  Dense kernel (in, out); Conv kernel (k, in, out).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

GAINS = {"linear": 1.0, "relu": math.sqrt(2.0), "tanh": 5.0 / 3.0, "sigmoid": 1.0}


def _fans(shape: tuple[int, ...]) -> tuple[int, int]:
    if len(shape) == 2:  # Dense: (in, out)
        return shape[0], shape[1]
    if len(shape) == 3:  # Conv1d: (k, in, out)
        rf = shape[0]
        return shape[1] * rf, shape[2] * rf
    raise ValueError(f"unsupported kernel shape {shape}")


def xavier_normal(gain_or_activation: float | str = 1.0):
    """torch ``xavier_normal_``: N(0, gain^2 * 2/(fan_in+fan_out))."""
    gain = (
        GAINS[gain_or_activation]
        if isinstance(gain_or_activation, str)
        else float(gain_or_activation)
    )

    def init(key, shape, dtype=jnp.float32):
        fan_in, fan_out = _fans(shape)
        std = gain * math.sqrt(2.0 / (fan_in + fan_out))
        return std * jax.random.normal(key, shape, dtype)

    return init


def xavier_uniform(gain: float = 1.0):
    """torch ``xavier_uniform_`` (used by MHA in-projections)."""

    def init(key, shape, dtype=jnp.float32):
        fan_in, fan_out = _fans(shape)
        bound = gain * math.sqrt(6.0 / (fan_in + fan_out))
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def torch_linear_kernel():
    """torch nn.Linear default: kaiming_uniform(a=sqrt(5)) == U(+-1/sqrt(fan_in))."""

    def init(key, shape, dtype=jnp.float32):
        fan_in, _ = _fans(shape)
        bound = 1.0 / math.sqrt(fan_in)
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def torch_linear_bias(fan_in: int):
    """torch nn.Linear default bias: U(+-1/sqrt(fan_in))."""

    def init(key, shape, dtype=jnp.float32):
        bound = 1.0 / math.sqrt(fan_in)
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init
