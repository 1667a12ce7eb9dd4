"""Fused residual-add + dropout + LayerNorm Pallas kernel (fwd + bwd).

The post-LN transformer layers (models/transformer.py) end every sublayer
with ``LN(x + Dropout(h))`` — per layer that is 2-3 chains of small VPU
kernels in the XLA path (dropout mask multiply, add, mean/var reduction,
normalize), each streaming the (B, T, D) activation through HBM again.
This kernel does the whole chain in one VMEM pass:

- forward: z = x + keep * h / (1-p)  ->  per-row mean/var (fp32)  ->
  y = (z - mu) * rsqrt(var + eps) * gamma + beta, cast back to storage dtype;
- backward: recomputes z and the row statistics (cheap VPU work, avoids
  saving fp32 residuals to HBM), regenerates the identical dropout mask
  via the layout-independent counter-hash (ops/pallas/dropout_mask.py),
  emits dx, dh per block and accumulates dgamma/dbeta in VMEM scratch
  across row-blocks (grid steps run sequentially on a TensorCore, so the
  accumulation is race-free).

Rows = flattened (B*T); the feature dim D maps to lanes (multiples of 128
lower best; any D works in interpret mode).  LayerNorm statistics use the
biased variance like torch/flax (eps inside the sqrt, 1e-5 default).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from transformertts_tpu.ops.pallas.dropout_mask import keep_mask, seed_from_rng


def _pick_rows(n: int, d: int) -> int:
    """Largest row block whose BACKWARD fits the 16 MiB scoped-VMEM stack.

    The backward keeps ~10 (rows, d) fp32 temporaries live on the Mosaic
    stack (z, zhat, dy, gf, dz, dh + input casts + keep mask) — 40 B per
    row element; a fixed 512-row block overflows at d=1024 — (512, 1024)
    blocks were rejected at 16.59 MiB on a v5e (round 4,
    /tmp/d1024_train.log) — so cap rows * d * 40 B under the limit with
    headroom.  d<=512 keeps the tuned 512-row blocks unchanged.

    The forward's live set is about half and would fit larger blocks,
    but fwd and bwd MUST use the SAME block size: the regenerated
    dropout mask is keyed on (block index, local row, col)
    (dropout_mask.keep_mask), so different block heights would assign
    different masks to the same logical element — silent dropout-
    gradient corruption, the exact bug class dropout_mask.py exists to
    prevent.  The forward therefore inherits the backward's budget."""
    budget_rows = (14 * 1024 * 1024) // (40 * d)
    for cand in (512, 256, 128, 64, 32, 16, 8):
        if cand <= budget_rows and n % cand == 0:
            return cand
    return n


def _z_and_stats(x_ref, h_ref, seed_ref, dropout, eps, block_id):
    x = x_ref[...].astype(jnp.float32)
    h = h_ref[...].astype(jnp.float32)
    if dropout > 0.0:
        keep = keep_mask(h.shape, dropout, seed_ref[0], block_id)
        h = jnp.where(keep, h / (1.0 - dropout), 0.0)
    else:
        keep = None
    z = x + h
    mu = jnp.mean(z, axis=1, keepdims=True)
    var = jnp.mean(jnp.square(z), axis=1, keepdims=True) - jnp.square(mu)
    rstd = jax.lax.rsqrt(jnp.maximum(var, 0.0) + eps)
    return z, mu, rstd, keep


def _fwd_kernel(seed_ref, x_ref, h_ref, g_ref, b_ref, y_ref, *, dropout, eps):
    i = pl.program_id(0)
    z, mu, rstd, _ = _z_and_stats(x_ref, h_ref, seed_ref, dropout, eps, i)
    zhat = (z - mu) * rstd
    y = zhat * g_ref[...].astype(jnp.float32) + b_ref[...].astype(jnp.float32)
    y_ref[...] = y.astype(y_ref.dtype)


def _bwd_kernel(
    seed_ref, x_ref, h_ref, g_ref, dy_ref,
    dx_ref, dh_ref, dg_ref, db_ref,
    dg_acc, db_acc,
    *, dropout, eps,
):
    i = pl.program_id(0)
    n = pl.num_programs(0)

    @pl.when(i == 0)
    def _init():
        dg_acc[...] = jnp.zeros_like(dg_acc)
        db_acc[...] = jnp.zeros_like(db_acc)

    z, mu, rstd, keep = _z_and_stats(x_ref, h_ref, seed_ref, dropout, eps, i)
    zhat = (z - mu) * rstd
    dy = dy_ref[...].astype(jnp.float32)

    dg_acc[...] += jnp.sum(dy * zhat, axis=0, keepdims=True)
    db_acc[...] += jnp.sum(dy, axis=0, keepdims=True)

    gf = dy * g_ref[...].astype(jnp.float32)
    m1 = jnp.mean(gf, axis=1, keepdims=True)
    m2 = jnp.mean(gf * zhat, axis=1, keepdims=True)
    dz = rstd * (gf - m1 - zhat * m2)

    dx_ref[...] = dz.astype(dx_ref.dtype)
    if dropout > 0.0:
        dh = jnp.where(keep, dz / (1.0 - dropout), 0.0)
    else:
        dh = dz
    dh_ref[...] = dh.astype(dh_ref.dtype)

    @pl.when(i == n - 1)
    def _flush():
        dg_ref[...] = dg_acc[...]
        db_ref[...] = db_acc[...]


def _fwd(x, h, gamma, beta, seed, dropout, eps, interpret):
    orig_shape = x.shape
    d = x.shape[-1]
    n = x.size // d
    x2 = x.reshape(n, d)
    h2 = h.reshape(n, d)
    rows = _pick_rows(n, d)
    g2 = gamma.reshape(1, d)
    b2 = beta.reshape(1, d)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n // rows,),
        in_specs=[
            pl.BlockSpec((rows, d), lambda i, *_: (i, 0)),
            pl.BlockSpec((rows, d), lambda i, *_: (i, 0)),
            pl.BlockSpec((1, d), lambda i, *_: (0, 0)),
            pl.BlockSpec((1, d), lambda i, *_: (0, 0)),
        ],
        out_specs=pl.BlockSpec((rows, d), lambda i, *_: (i, 0)),
    )
    y = pl.pallas_call(
        functools.partial(_fwd_kernel, dropout=dropout, eps=eps),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, d), x.dtype),
        interpret=interpret,
    )(seed, x2, h2, g2, b2)
    return y.reshape(orig_shape)


def _bwd(dropout, eps, interpret, res, g):
    x, h, gamma, seed = res
    orig_shape = x.shape
    d = x.shape[-1]
    n = x.size // d
    rows = _pick_rows(n, d)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n // rows,),
        in_specs=[
            pl.BlockSpec((rows, d), lambda i, *_: (i, 0)),
            pl.BlockSpec((rows, d), lambda i, *_: (i, 0)),
            pl.BlockSpec((1, d), lambda i, *_: (0, 0)),
            pl.BlockSpec((rows, d), lambda i, *_: (i, 0)),
        ],
        out_specs=[
            pl.BlockSpec((rows, d), lambda i, *_: (i, 0)),
            pl.BlockSpec((rows, d), lambda i, *_: (i, 0)),
            pl.BlockSpec((1, d), lambda i, *_: (0, 0)),
            pl.BlockSpec((1, d), lambda i, *_: (0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, d), jnp.float32),
            pltpu.VMEM((1, d), jnp.float32),
        ],
    )
    dx, dh, dg, db = pl.pallas_call(
        functools.partial(_bwd_kernel, dropout=dropout, eps=eps),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n, d), x.dtype),
            jax.ShapeDtypeStruct((n, d), h.dtype),
            jax.ShapeDtypeStruct((1, d), jnp.float32),
            jax.ShapeDtypeStruct((1, d), jnp.float32),
        ],
        interpret=interpret,
    )(seed, x.reshape(n, d), h.reshape(n, d), gamma.reshape(1, d), g.reshape(n, d))
    return (
        dx.reshape(orig_shape),
        dh.reshape(orig_shape),
        dg.reshape(gamma.shape).astype(gamma.dtype),
        db.reshape(gamma.shape).astype(gamma.dtype),
        None,
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def _fused(x, h, gamma, beta, seed, dropout, eps, interpret):
    return _fwd(x, h, gamma, beta, seed, dropout, eps, interpret)


def _fused_fwd(x, h, gamma, beta, seed, dropout, eps, interpret):
    out = _fwd(x, h, gamma, beta, seed, dropout, eps, interpret)
    return out, (x, h, gamma, seed)


_fused.defvjp(_fused_fwd, _bwd)


def residual_dropout_layernorm(
    x: jnp.ndarray,  # (..., D) residual stream
    h: jnp.ndarray,  # (..., D) sublayer output (dropout applied to this)
    gamma: jnp.ndarray,  # (D,) LayerNorm scale
    beta: jnp.ndarray,  # (D,) LayerNorm bias
    dropout: float = 0.0,
    dropout_rng: jax.Array | None = None,
    eps: float = 1e-5,
    interpret: bool = False,
) -> jnp.ndarray:
    """``LayerNorm(x + Dropout(h))`` in one fused pass; differentiable."""
    seed = seed_from_rng(dropout, dropout_rng)
    return _fused(x, h, gamma, beta, seed, float(dropout), float(eps), interpret)
