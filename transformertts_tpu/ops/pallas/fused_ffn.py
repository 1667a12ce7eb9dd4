"""Fused feed-forward Pallas kernel: W2 @ Dropout(relu(W1 x + b1)) + b2.

The transformer FFN (models/transformer.py:FeedForward, ref:
model/model.py:189-200 via torch's TransformerEncoderLayer) expands
d_model -> d_ffn (256 -> 1024) and back.  On the XLA path the (B, T, d_ffn)
activation makes three HBM round-trips per call (matmul out, dropout
mask-multiply, second matmul in); at d_model 256 the step is
bandwidth/latency-bound (PERF.md), so those round-trips — not FLOPs — are
the cost.  This kernel keeps both weight matrices resident in VMEM
(256x1024 + 1024x256 bf16 ~ 1 MB), grids over row-blocks of the flattened
(B*T, d_model) input, and does linear -> bias -> relu -> dropout -> linear
in one pass; the d_ffn-wide intermediate never leaves VMEM.

- Matmul operands stay in storage dtype (bf16 fast path) for full-rate MXU
  with fp32 accumulation (same rule as flash_attention.py); bias/relu/
  dropout run in fp32.
- Dropout uses the layout-independent counter-hash mask
  (ops/pallas/dropout_mask.py) keyed by (seed, row-block, element index);
  the backward pass regenerates the identical keep-mask from the same
  arguments instead of saving it.  Works in interpret mode too.
- Backward recomputes the hidden activation from (x, W1, b1) — cheap MXU
  work — and accumulates dW1/db1/dW2/db2 in VMEM fp32 scratch across the
  sequentially-executed row-blocks, emitting dx per block.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from transformertts_tpu.ops.pallas.dropout_mask import keep_mask, seed_from_rng


# scoped VMEM is 16 MB; leave headroom for Mosaic's own staging
_VMEM_BUDGET = 13 * 1024 * 1024


def _bwd_vmem(rows: int, d: int, f: int, itemsize: int) -> int:
    """Backward-kernel VMEM estimate (the binding constraint): fp32
    dW1/dW2 accumulators + both weight blocks + per-row-block x/dy/dx and
    three (rows, f) fp32 intermediates (hp, hd, dh)."""
    fixed = 8 * d * f + 2 * itemsize * d * f
    per_row = 3 * d * itemsize + 4 * d + 12 * f
    return fixed + rows * per_row


def fused_ffn_fits(d: int, f: int, itemsize: int = 2) -> bool:
    """Whether the kernel can run at all for this (d_model, d_ffn): at
    large widths the weight-gradient scratch alone can blow the 16 MB
    scoped-VMEM limit (observed: d=512, f=2048 needs rows <= 64)."""
    return _bwd_vmem(8, d, f, itemsize) <= _VMEM_BUDGET


def _pick_rows(n: int, d: int, f: int, itemsize: int) -> int:
    """Largest row block (cap 256) fitting the backward's VMEM footprint.

    Prefers a divisor of n (no padding); otherwise the caller zero-pads n
    up to a multiple — padded rows contribute exactly zero to every
    gradient because their dy rows are zero.  Raises only when even an
    8-row block cannot fit (callers gate on fused_ffn_fits())."""
    fitting = [
        c for c in (256, 128, 64, 32, 16, 8)
        if _bwd_vmem(c, d, f, itemsize) <= _VMEM_BUDGET
    ]
    if not fitting:
        raise ValueError(
            f"fused_ffn does not fit VMEM for d_model={d}, d_ffn={f} "
            f"(gate callers on fused_ffn_fits())"
        )
    for cand in fitting:
        if n % cand == 0:
            return cand
    return fitting[0]


def _hidden(x_ref, w1_ref, b1_ref, seed_ref, dropout, block_id):
    """relu(x @ W1 + b1) with optional dropout; returns (pre-act, dropped)."""
    x = x_ref[...]
    hp = jax.lax.dot_general(
        x, w1_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b1_ref[...].astype(jnp.float32)
    h = jnp.maximum(hp, 0.0)
    if dropout > 0.0:
        keep = keep_mask(h.shape, dropout, seed_ref[0], block_id)
        hd = jnp.where(keep, h / (1.0 - dropout), 0.0)
    else:
        keep = None
        hd = h
    return hp, hd, keep


def _fwd_kernel(seed_ref, x_ref, w1_ref, b1_ref, w2_ref, b2_ref, y_ref, *, dropout):
    i = pl.program_id(0)
    _, hd, _ = _hidden(x_ref, w1_ref, b1_ref, seed_ref, dropout, i)
    y = jax.lax.dot_general(
        hd.astype(x_ref.dtype), w2_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b2_ref[...].astype(jnp.float32)
    y_ref[...] = y.astype(y_ref.dtype)


def _bwd_kernel(
    seed_ref, x_ref, w1_ref, b1_ref, w2_ref, dy_ref,
    dx_ref, dw1_ref, db1_ref, dw2_ref, db2_ref,
    dw1_acc, db1_acc, dw2_acc, db2_acc,
    *, dropout,
):
    i = pl.program_id(0)
    n = pl.num_programs(0)

    @pl.when(i == 0)
    def _init():
        dw1_acc[...] = jnp.zeros_like(dw1_acc)
        db1_acc[...] = jnp.zeros_like(db1_acc)
        dw2_acc[...] = jnp.zeros_like(dw2_acc)
        db2_acc[...] = jnp.zeros_like(db2_acc)

    hp, hd, keep = _hidden(x_ref, w1_ref, b1_ref, seed_ref, dropout, i)
    x = x_ref[...]
    dy = dy_ref[...]
    dy32 = dy.astype(jnp.float32)

    # dL/d(hd) = dy @ W2^T
    dhd = jax.lax.dot_general(
        dy, w2_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dh = jnp.where(hp > 0.0, dhd, 0.0)
    if dropout > 0.0:
        dh = jnp.where(keep, dh / (1.0 - dropout), 0.0)
    dh_c = dh.astype(x.dtype)

    dx_ref[...] = jax.lax.dot_general(
        dh_c, w1_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dx_ref.dtype)

    dw1_acc[...] += jax.lax.dot_general(
        x, dh_c, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    db1_acc[...] += jnp.sum(dh, axis=0, keepdims=True)
    dw2_acc[...] += jax.lax.dot_general(
        hd.astype(dy.dtype), dy, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    db2_acc[...] += jnp.sum(dy32, axis=0, keepdims=True)

    @pl.when(i == n - 1)
    def _flush():
        dw1_ref[...] = dw1_acc[...]
        db1_ref[...] = db1_acc[...]
        dw2_ref[...] = dw2_acc[...]
        db2_ref[...] = db2_acc[...]


def _fwd(x, w1, b1, w2, b2, seed, dropout, interpret):
    orig_shape = x.shape
    d = x.shape[-1]
    f = w1.shape[-1]
    n = x.size // d
    rows = _pick_rows(n, d, f, x.dtype.itemsize)
    x2 = x.reshape(n, d)
    n_pad = -n % rows
    if n_pad:
        x2 = jnp.pad(x2, ((0, n_pad), (0, 0)))
    cdtype = x.dtype
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=((n + n_pad) // rows,),
        in_specs=[
            pl.BlockSpec((rows, d), lambda i, *_: (i, 0)),
            pl.BlockSpec((d, f), lambda i, *_: (0, 0)),
            pl.BlockSpec((1, f), lambda i, *_: (0, 0)),
            pl.BlockSpec((f, d), lambda i, *_: (0, 0)),
            pl.BlockSpec((1, d), lambda i, *_: (0, 0)),
        ],
        out_specs=pl.BlockSpec((rows, d), lambda i, *_: (i, 0)),
    )
    y = pl.pallas_call(
        functools.partial(_fwd_kernel, dropout=dropout),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n + n_pad, d), x.dtype),
        interpret=interpret,
    )(
        seed, x2, w1.astype(cdtype), b1.reshape(1, f),
        w2.astype(cdtype), b2.reshape(1, d),
    )
    return y[:n].reshape(orig_shape)


def _bwd(dropout, interpret, res, g):
    x, w1, b1, w2, b2, seed = res
    orig_shape = x.shape
    d = x.shape[-1]
    f = w1.shape[-1]
    n = x.size // d
    rows = _pick_rows(n, d, f, x.dtype.itemsize)
    x2 = x.reshape(n, d)
    g2 = g.reshape(n, d)
    n_pad = -n % rows
    if n_pad:
        # zero dy rows make every padded-row gradient contribution vanish;
        # same blocking as the forward, so the regenerated masks line up
        x2 = jnp.pad(x2, ((0, n_pad), (0, 0)))
        g2 = jnp.pad(g2, ((0, n_pad), (0, 0)))
    cdtype = x.dtype
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=((n + n_pad) // rows,),
        in_specs=[
            pl.BlockSpec((rows, d), lambda i, *_: (i, 0)),
            pl.BlockSpec((d, f), lambda i, *_: (0, 0)),
            pl.BlockSpec((1, f), lambda i, *_: (0, 0)),
            pl.BlockSpec((f, d), lambda i, *_: (0, 0)),
            pl.BlockSpec((rows, d), lambda i, *_: (i, 0)),
        ],
        out_specs=[
            pl.BlockSpec((rows, d), lambda i, *_: (i, 0)),
            pl.BlockSpec((d, f), lambda i, *_: (0, 0)),
            pl.BlockSpec((1, f), lambda i, *_: (0, 0)),
            pl.BlockSpec((f, d), lambda i, *_: (0, 0)),
            pl.BlockSpec((1, d), lambda i, *_: (0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((d, f), jnp.float32),
            pltpu.VMEM((1, f), jnp.float32),
            pltpu.VMEM((f, d), jnp.float32),
            pltpu.VMEM((1, d), jnp.float32),
        ],
    )
    dx, dw1, db1, dw2, db2 = pl.pallas_call(
        functools.partial(_bwd_kernel, dropout=dropout),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n + n_pad, d), x.dtype),
            jax.ShapeDtypeStruct((d, f), jnp.float32),
            jax.ShapeDtypeStruct((1, f), jnp.float32),
            jax.ShapeDtypeStruct((f, d), jnp.float32),
            jax.ShapeDtypeStruct((1, d), jnp.float32),
        ],
        interpret=interpret,
    )(
        seed, x2, w1.astype(cdtype), b1.reshape(1, f),
        w2.astype(cdtype), g2,
    )
    return (
        dx[:n].reshape(orig_shape),
        dw1.astype(w1.dtype),
        db1.reshape((f,)).astype(b1.dtype),
        dw2.astype(w2.dtype),
        db2.reshape((d,)).astype(b2.dtype),
        None,
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def _fused(x, w1, b1, w2, b2, seed, dropout, interpret):
    return _fwd(x, w1, b1, w2, b2, seed, dropout, interpret)


def _fused_fwd(x, w1, b1, w2, b2, seed, dropout, interpret):
    out = _fwd(x, w1, b1, w2, b2, seed, dropout, interpret)
    return out, (x, w1, b1, w2, b2, seed)


_fused.defvjp(_fused_fwd, _bwd)


def fused_ffn(
    x: jnp.ndarray,  # (..., D)
    w1: jnp.ndarray,  # (D, F)
    b1: jnp.ndarray,  # (F,)
    w2: jnp.ndarray,  # (F, D)
    b2: jnp.ndarray,  # (D,)
    dropout: float = 0.0,
    dropout_rng: jax.Array | None = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """``(x @ W1 + b1).relu().dropout() @ W2 + b2`` in one pass; differentiable."""
    seed = seed_from_rng(dropout, dropout_rng)
    return _fused(x, w1, b1, w2, b2, seed, float(dropout), interpret)
