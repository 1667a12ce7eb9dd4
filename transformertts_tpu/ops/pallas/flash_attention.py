"""Fused multi-head attention Pallas kernel (forward + backward + dropout).

Replaces the ATen fused attention the reference reaches via torch
(SURVEY.md §2.2) with a TPU-native kernel.  Design point: TTS sequences are
short (mel <= ~900 frames, phonemes <= ~180), so keys/values for one
(batch, head) fit comfortably in VMEM.  The kernel therefore:

- grids over (batch*heads, q-blocks) with q-blocks as large as VMEM
  allows (usually the full row — fewer grid cells measured faster,
  tools/ab_flash.py), holding full K/V rows in VMEM;
- computes scores -> bias/causal mask -> fp32 softmax -> (optional
  attention-weight dropout, torch-MHA style) -> output fused; the O(T^2)
  score matrix never touches HBM (XLA's unfused path writes + reads it
  twice per layer per direction — the HBM-bandwidth win);
- keeps per-row scalars (softmax normalizer, dropout rescale, 1/sqrt(d)
  scale) off the (block_q, Tk) matrices: they ride on the small
  (block_q, d) matmul operands/outputs instead — VPU work scales with
  T*d, not T^2;
- backward recomputes probabilities blockwise (regenerating the identical
  dropout mask via the layout-independent counter-hash keyed by
  (seed, bh, q-block) — ops/pallas/dropout_mask.py) and accumulates
  dK/dV in VMEM scratch across q-blocks, emitting dQ per block.

Masking: optional causal flag (self-attention) + additive key bias (B, Tk)
with 0 / -1e9 entries (padding), matching models/masks.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from transformertts_tpu.ops.pallas.dropout_mask import keep_mask, seed_from_rng

NEG_INF = -1e9


def _exp(x: jnp.ndarray) -> jnp.ndarray:
    """exp over the (block_q, Tk) shifted scores.

    With TTS_FLASH_BF16_EXP=1 the exponential runs on bf16 (packed 2/lane
    on the VPU): inputs are <= 0, outputs in [0, 1], and the resulting
    probabilities are cast to bf16 for the PV matmul anyway — the row-sum
    normalizer still accumulates in fp32.
    """
    import os

    if os.environ.get("TTS_FLASH_BF16_EXP", "0") == "1":
        return jnp.exp(x.astype(jnp.bfloat16))
    return jnp.exp(x)


def _pick_block(t: int, tk: int) -> int:
    """Largest q-block whose fp32 (block_q, Tk) score intermediates fit VMEM.

    Bigger blocks win on-chip (fewer grid cells, larger matmuls, K/V loaded
    once): measured 42.8 -> 39.0 ms/step going 256 -> 768 at Tq=Tk=768
    (tools/ab_flash.py).  The cap keeps ~6 live (block_q, Tk) fp32 buffers
    (scores/exp/mask/dp in the backward) plus K/V inside the 16 MB VMEM.
    """
    import os

    forced = int(os.environ.get("TTS_FLASH_BLOCK_Q", "0"))
    if forced and t % forced == 0:
        return forced
    for cand in (1024, 768, 512, 384, 256, 128, 64, 32, 16, 8):
        if t % cand == 0 and cand * tk <= 620_000:
            return cand
    # irregular t (no aligned divisor): largest divisor of t under the VMEM
    # cap — the grid math (tq // block_q) requires an exact divisor, and the
    # cap must hold for any length, not just the candidate list
    for cand in range(min(t, max(620_000 // max(tk, 1), 1)), 0, -1):
        if t % cand == 0:
            return cand
    return t


def _scale_is_exact(scale: float) -> bool:
    """True when ``scale`` is a power of two (exactly representable, and
    multiplication by it is exact in any binary float dtype)."""
    import math

    m, _ = math.frexp(scale)
    return m == 0.5


def _scores(q_ref, k_ref, bias_ref, qi, scale, causal, block_q):
    # operands stay in their storage dtype (bf16 on the fast path) — the MXU
    # runs full-rate bf16 with fp32 accumulation via preferred_element_type;
    # upcasting first would force slow multi-pass fp32 matmuls.  The softmax
    # scale is folded into the (block_q, d) Q operand when it is a power of
    # two (d_head 4, 16, 64, 256, ... — exact in bf16), replacing a
    # (block_q, Tk) fp32 multiply with a (block_q, d) one; for other head
    # dims (e.g. d_head=128, scale 2^-3.5) it stays on the fp32 scores so
    # the fold never costs precision.
    fold = _scale_is_exact(scale)
    q = q_ref[0] * jnp.asarray(scale, q_ref.dtype) if fold else q_ref[0]
    k = k_ref[0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    if not fold:
        s = s * scale
    s = s + bias_ref[0].astype(jnp.float32)  # (1, Tk) broadcasts over rows
    if causal:
        row = qi * block_q + jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col <= row, s, NEG_INF)
    return s


# ------------------------------------------------------------------ forward


def _fwd_kernel(
    seed_ref, q_ref, k_ref, v_ref, bias_ref, o_ref,
    *, scale, causal, block_q, dropout,
):
    bh, qi = pl.program_id(0), pl.program_id(1)
    s = _scores(q_ref, k_ref, bias_ref, qi, scale, causal, block_q)

    m = jnp.max(s, axis=1, keepdims=True)
    e = _exp(s - m)
    l = jnp.sum(e, axis=1, dtype=jnp.float32, keepdims=True)
    # softmax normalization (and the dropout 1/(1-p) rescale) are per-row
    # scalars — applied to the (block_q, d) output instead of the
    # (block_q, Tk) probability matrix (row_i(e @ v) / l_i == row_i(p @ v))
    if dropout > 0.0:
        keep = keep_mask(e.shape, dropout, seed_ref[0], bh * 8192 + qi)
        e = jnp.where(keep, e, 0.0)
        norm = 1.0 / (l * (1.0 - dropout))
    else:
        norm = 1.0 / l
    v = v_ref[0]
    o = jax.lax.dot_general(
        e.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * norm
    o_ref[0] = o.astype(o_ref.dtype)


def _fwd(q, k, v, bias, seed, scale, causal, dropout, interpret):
    b, h, tq, d = q.shape
    tk = k.shape[2]
    block_q = _pick_block(tq, tk)

    q4 = q.reshape(b * h, tq, d)
    k4 = k.reshape(b * h, tk, d)
    v4 = v.reshape(b * h, tk, d)
    bias2 = jnp.broadcast_to(bias[:, None, :], (b, h, tk)).reshape(b * h, 1, tk)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b * h, tq // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda bh, qi, *_: (bh, qi, 0)),
            pl.BlockSpec((1, tk, d), lambda bh, qi, *_: (bh, 0, 0)),
            pl.BlockSpec((1, tk, d), lambda bh, qi, *_: (bh, 0, 0)),
            pl.BlockSpec((1, 1, tk), lambda bh, qi, *_: (bh, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda bh, qi, *_: (bh, qi, 0)),
    )
    out = pl.pallas_call(
        functools.partial(
            _fwd_kernel, scale=scale, causal=causal, block_q=block_q, dropout=dropout
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b * h, tq, d), q.dtype),
        interpret=interpret,
    )(seed, q4, k4, v4, bias2)
    return out.reshape(b, h, tq, d)


# ----------------------------------------------------------------- backward


def _bwd_kernel(
    seed_ref, q_ref, k_ref, v_ref, bias_ref, o_ref, do_ref,
    dq_ref, dk_ref, dv_ref,
    dk_acc, dv_acc,
    *, scale, causal, block_q, dropout,
):
    bh, qi = pl.program_id(0), pl.program_id(1)
    n_q = pl.num_programs(1)

    @pl.when(qi == 0)
    def _init():
        dk_acc[...] = jnp.zeros_like(dk_acc)
        dv_acc[...] = jnp.zeros_like(dv_acc)

    # full K rows are resident in VMEM, so the softmax stats are recomputed
    # here instead of saving LSE in the forward (avoids a lane-unaligned
    # dynamic write that Mosaic rejects for small q-blocks)
    s = _scores(q_ref, k_ref, bias_ref, qi, scale, causal, block_q)
    m = jnp.max(s, axis=1, keepdims=True)
    e = _exp(s - m)  # unnormalized probabilities; p = e * r
    r = 1.0 / jnp.sum(e, axis=1, dtype=jnp.float32, keepdims=True)  # (block_q, 1)

    v = v_ref[0]
    o = o_ref[0].astype(jnp.float32)
    do = do_ref[0]

    dp_tilde = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (block_q, Tk) = dL/d(p_dropped)
    # per-row scalars (softmax normalizer r, dropout 1/(1-p), softmax scale)
    # ride on the small (block_q, d) operands/outputs of the matmuls below
    # rather than on (block_q, Tk) matrices:
    #   dv += p_dropped^T @ do           == e_dropped^T @ (do * r * inv)
    #   ds  = p * (dp - delta) * scale;  dp = keep ? dp_tilde * inv : 0
    #       -> ds0 = e * (dp' - delta'),  dp' = keep ? dp_tilde : 0,
    #          delta' folded per-branch, with (r * scale) applied to the
    #          dq output rows / the q operand of dk
    if dropout > 0.0:
        # identical mask to forward: pure function of (seed, bh, qi, index)
        keep = keep_mask(e.shape, dropout, seed_ref[0], bh * 8192 + qi)
        inv = 1.0 / (1.0 - dropout)
        e_dropped = jnp.where(keep, e, 0.0)
        do_scaled = (do.astype(jnp.float32) * (r * inv)).astype(do.dtype)
        dp = jnp.where(keep, dp_tilde * inv, 0.0)
    else:
        e_dropped = e
        do_scaled = (do.astype(jnp.float32) * r).astype(do.dtype)
        dp = dp_tilde

    dv_acc[...] += jax.lax.dot_general(
        e_dropped.astype(do.dtype), do_scaled, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (Tk, D)

    # delta_i = sum_k dp~_ik p~_ik = dO_i . O_i
    delta = jnp.sum(do.astype(jnp.float32) * o, axis=1, keepdims=True)
    ds0 = (e * (dp - delta)).astype(q_ref.dtype)
    rs = r * scale  # (block_q, 1)
    q = q_ref[0]
    k = k_ref[0]
    dq_ref[0] = (
        jax.lax.dot_general(
            ds0, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ) * rs
    ).astype(dq_ref.dtype)
    q_scaled = (q.astype(jnp.float32) * rs).astype(q.dtype)
    dk_acc[...] += jax.lax.dot_general(
        ds0, q_scaled, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )

    @pl.when(qi == n_q - 1)
    def _flush():
        dk_ref[0] = dk_acc[...].astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[...].astype(dv_ref.dtype)


def _bwd(scale, causal, dropout, interpret, res, g):
    q, k, v, bias, seed, out = res
    do = g
    b, h, tq, d = q.shape
    tk = k.shape[2]
    block_q = _pick_block(tq, tk)

    q4 = q.reshape(b * h, tq, d)
    k4 = k.reshape(b * h, tk, d)
    v4 = v.reshape(b * h, tk, d)
    o4 = out.reshape(b * h, tq, d)
    do4 = do.reshape(b * h, tq, d)
    bias2 = jnp.broadcast_to(bias[:, None, :], (b, h, tk)).reshape(b * h, 1, tk)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b * h, tq // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda bh, qi, *_: (bh, qi, 0)),
            pl.BlockSpec((1, tk, d), lambda bh, qi, *_: (bh, 0, 0)),
            pl.BlockSpec((1, tk, d), lambda bh, qi, *_: (bh, 0, 0)),
            pl.BlockSpec((1, 1, tk), lambda bh, qi, *_: (bh, 0, 0)),
            pl.BlockSpec((1, block_q, d), lambda bh, qi, *_: (bh, qi, 0)),
            pl.BlockSpec((1, block_q, d), lambda bh, qi, *_: (bh, qi, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, d), lambda bh, qi, *_: (bh, qi, 0)),
            pl.BlockSpec((1, tk, d), lambda bh, qi, *_: (bh, 0, 0)),
            pl.BlockSpec((1, tk, d), lambda bh, qi, *_: (bh, 0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((tk, d), jnp.float32),
            pltpu.VMEM((tk, d), jnp.float32),
        ],
    )
    dq, dk, dv = pl.pallas_call(
        functools.partial(
            _bwd_kernel, scale=scale, causal=causal, block_q=block_q, dropout=dropout
        ),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b * h, tq, d), q.dtype),
            jax.ShapeDtypeStruct((b * h, tk, d), k.dtype),
            jax.ShapeDtypeStruct((b * h, tk, d), v.dtype),
        ],
        interpret=interpret,
    )(seed, q4, k4, v4, bias2, o4, do4)
    return (
        dq.reshape(b, h, tq, d),
        dk.reshape(b, h, tk, d),
        dv.reshape(b, h, tk, d),
        None,
        None,
    )


# -------------------------------------------------------------------- public


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def _flash(q, k, v, bias, seed, scale, causal, dropout, interpret):
    return _fwd(q, k, v, bias, seed, scale, causal, dropout, interpret)


def _flash_fwd(q, k, v, bias, seed, scale, causal, dropout, interpret):
    out = _fwd(q, k, v, bias, seed, scale, causal, dropout, interpret)
    return out, (q, k, v, bias, seed, out)


_flash.defvjp(_flash_fwd, _bwd)


def flash_attention(
    q: jnp.ndarray,  # (B, Tq, H, D) — layout used by models/attention.py
    k: jnp.ndarray,  # (B, Tk, H, D)
    v: jnp.ndarray,  # (B, Tk, H, D)
    key_bias: jnp.ndarray | None = None,  # (B, Tk) additive, 0 / -1e9
    causal: bool = False,
    dropout: float = 0.0,
    dropout_rng: jax.Array | None = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused attention; differentiable; returns (B, Tq, H, D)."""
    b, tq, h, d = q.shape
    tk = k.shape[1]
    if key_bias is None:
        key_bias = jnp.zeros((b, tk), jnp.float32)
    seed = seed_from_rng(dropout, dropout_rng)
    scale = d ** -0.5
    qt = q.transpose(0, 2, 1, 3)
    kt = k.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)
    out = _flash(
        qt, kt, vt, key_bias.astype(jnp.float32), seed, scale, causal,
        float(dropout), interpret,
    )
    return out.transpose(0, 2, 1, 3)
