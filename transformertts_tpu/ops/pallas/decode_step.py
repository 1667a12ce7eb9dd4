"""Single-kernel autoregressive decode step (the serving fast path).

The KV-cached decode loop (infer/decode.py) is launch-bound at batch 1:
~107 XLA ops per generated frame (projections, per-head attentions, LNs,
FFN) measured at ~42 us/frame on a v5e — ~7x the weight-streaming bound.
This kernel runs the ENTIRE decoder step as ONE Pallas program:

    prenet -> +alpha*PE[t] -> L x [cached self-attn -> cross-attn -> FFN,
    post-LN] -> mel/stop heads

with every weight and both caches resident in VMEM for the step.  The new
K/V row is returned as an output and written into the HBM cache by a
single ``dynamic_update_slice`` pair in the caller (writing at a dynamic
position inside the kernel would need a lane/sublane-dynamic store that
Mosaic restricts); self-attention instead folds the current position in
closed form: softmax over (masked prefix scores, current score).

Layout rules that make this lower on current Mosaic:
- per-head weight/cache slicing happens on LEADING dims only — packing
  reshapes (D, D) projections to (H, D, Dh) on the host (lane-dim slices
  at 64 alignment are rejected);
- all matmuls keep operands in bf16 with fp32 accumulation;
- the default kernel is batch-1 (the single-stream latency path); the
  batched variant (``decode_step_batched``) flattens caches to
  (L, H, B*T, dh) and runs each head's attention as ONE 2-D score matmul
  with a block mask — the same op structure as batch-1, so Mosaic code
  size stays flat in B (the earlier leading-batch-dim dot_general version
  unrolled per batch element into a 5.2 MB module).  The auto gate
  (``decode_megakernel_max_batch``) decides batched-kernel vs the XLA
  loop, which amortizes dispatch across rows at large batch.

Numerics match DecoderLayer.cached_step (post-LN, fp32 softmax/LN) to
bf16 tolerance; oracle equivalence is tested in tests/test_decode_step.py.
Reference behavior being replaced: model/model.py:354-374 re-runs the full
decoder per frame with no cache at all.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e9

# Per-kernel scoped-VMEM cap (CompilerParams.vmem_limit_bytes).  The
# default 16 MiB scoped limit bounds only the kernel's STACK (operand
# windows are allocated outside it — measured round 4: B=4 with ~50 MB
# of cache operands compiled fine while B=8's 16.84 MiB stack was
# rejected at 16 MiB, /tmp/r4_mega_numerics.log).  64 MiB leaves the
# remaining ~64 MiB of a v5e core's 128 MiB VMEM for operands; the
# decode_step_fits gate keeps the combined footprint under hardware.
_VMEM_LIMIT_BYTES = 64 * 1024 * 1024


def pack_decode_weights(params, cfg, dtype=jnp.bfloat16):
    """Flax param tree -> dict of stacked per-layer arrays for the kernel.

    Per-head splits are materialized here, on the host, so the kernel only
    ever indexes leading dimensions.
    """
    L = cfg.model.decoder_n_layers
    H = cfg.model.decoder_n_head
    D = cfg.model.d_model
    dh = D // H

    def head_w(w):  # (D, D) -> (H, D, dh)
        return jnp.transpose(w.reshape(D, H, dh), (1, 0, 2))

    def head_b(b):  # (D,) -> (H, 1, dh) — kept 2-D per head for Mosaic
        return b.reshape(H, 1, dh)

    layers = [params["decoder"][f"layer_{i}"] for i in range(L)]

    def stack(fn):
        return jnp.stack([fn(lyr) for lyr in layers]).astype(dtype)

    pn = params["dec_prenet"]
    packed = {
        "pw1": pn["LinearNorm_0"]["Dense_0"]["kernel"].astype(dtype),
        "pb1": pn["LinearNorm_0"]["Dense_0"]["bias"].astype(dtype).reshape(1, D),
        "pw2": pn["LinearNorm_1"]["Dense_0"]["kernel"].astype(dtype),
        "pb2": pn["LinearNorm_1"]["Dense_0"]["bias"].astype(dtype).reshape(1, D),
        "sWq": stack(lambda l: head_w(l["self_attn"]["q_proj"]["kernel"])),
        "sbq": stack(lambda l: head_b(l["self_attn"]["q_proj"]["bias"])),
        "sWk": stack(lambda l: head_w(l["self_attn"]["k_proj"]["kernel"])),
        "sbk": stack(lambda l: head_b(l["self_attn"]["k_proj"]["bias"])),
        "sWv": stack(lambda l: head_w(l["self_attn"]["v_proj"]["kernel"])),
        "sbv": stack(lambda l: head_b(l["self_attn"]["v_proj"]["bias"])),
        # out-projection consumed per head: (D, D) -> (H, dh, D)
        "sWo": stack(
            lambda l: l["self_attn"]["out_proj"]["kernel"].reshape(H, dh, D)
        ),
        "sbo": stack(lambda l: l["self_attn"]["out_proj"]["bias"].reshape(1, D)),
        "cWq": stack(lambda l: head_w(l["cross_attn"]["q_proj"]["kernel"])),
        "cbq": stack(lambda l: head_b(l["cross_attn"]["q_proj"]["bias"])),
        "cWo": stack(
            lambda l: l["cross_attn"]["out_proj"]["kernel"].reshape(H, dh, D)
        ),
        "cbo": stack(lambda l: l["cross_attn"]["out_proj"]["bias"].reshape(1, D)),
        "W1": stack(lambda l: l["ffn"]["Dense_0"]["kernel"]),
        "B1": stack(lambda l: l["ffn"]["Dense_0"]["bias"].reshape(1, -1)),
        "W2": stack(lambda l: l["ffn"]["Dense_1"]["kernel"]),
        "B2": stack(lambda l: l["ffn"]["Dense_1"]["bias"].reshape(1, -1)),
        # LN params stay fp32: the normalization itself runs in fp32.
        # Shape (L, 3, 1, D) so per-(layer, sublayer) reads are 2-D.
        "ln_g": jnp.stack([
            jnp.stack([lyr[f"norm{j}"]["scale"][None] for j in (1, 2, 3)])
            for lyr in layers
        ]).astype(jnp.float32),
        "ln_b": jnp.stack([
            jnp.stack([lyr[f"norm{j}"]["bias"][None] for j in (1, 2, 3)])
            for lyr in layers
        ]).astype(jnp.float32),
        # mel and stop heads fused into one (D, n_mels*r + r) matmul — no
        # in-kernel lane concat; the caller splits the output row
        "head_w": jnp.concatenate([
            params["mel_linear"]["Dense_0"]["kernel"],
            params["stop_linear"]["Dense_0"]["kernel"],
        ], axis=1).astype(dtype),
        "head_b": jnp.concatenate([
            params["mel_linear"]["Dense_0"]["bias"],
            params["stop_linear"]["Dense_0"]["bias"],
        ]).astype(dtype).reshape(1, -1),
    }
    return packed


_PACK_ORDER = (
    "pw1", "pb1", "pw2", "pb2",
    "sWq", "sbq", "sWk", "sbk", "sWv", "sbv", "sWo", "sbo",
    "cWq", "cbq", "cWo", "cbo",
    "W1", "B1", "W2", "B2", "ln_g", "ln_b",
    "head_w", "head_b",
)


def _dot(a, b):
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


def _layer_norm(x32, g, b, eps=1e-5):
    mu = jnp.mean(x32, axis=1, keepdims=True)
    var = jnp.mean(jnp.square(x32), axis=1, keepdims=True) - jnp.square(mu)
    return (x32 - mu) * jax.lax.rsqrt(jnp.maximum(var, 0.0) + eps) * g + b


def _kernel(
    t_ref,
    # data
    frame_ref, pe_ref, cross_bias_ref, kc_ref, vc_ref, ck_ref, cv_ref,
    # weights (order == _PACK_ORDER)
    pw1, pb1, pw2, pb2,
    sWq, sbq, sWk, sbk, sWv, sbv, sWo, sbo,
    cWq, cbq, cWo, cbo,
    W1, B1, W2, B2, ln_g, ln_b,
    head_w, head_b,
    # outputs (pos_ref only when with_attn_pos)
    y_ref, knew_ref, vnew_ref, *maybe_pos_ref,
    n_layers, n_heads, scale, dtype, with_attn_pos=False,
):
    t = t_ref[0]
    n_pos = kc_ref.shape[2]
    if with_attn_pos:
        # expected encoder position of the LAST layer's cross-attention,
        # head-averaged — drives the caller's monotone window center
        # (infer/decode.py windowed decode)
        pos_ref = maybe_pos_ref[0]
        tp = ck_ref.shape[2]
        # int32 iota + cast: Mosaic's tpu.iota must produce integers (a
        # float iota lowers fine in interpret mode but is rejected on-chip
        # — caught by the round-5 on-chip A/B at B=1)
        col_f = jax.lax.broadcasted_iota(jnp.int32, (1, tp), 1).astype(
            jnp.float32
        )
        pos_acc = jnp.zeros((1, 1), jnp.float32)

    # decoder prenet (dropout off at inference — ref model/model.py:342)
    x = frame_ref[...].astype(dtype)
    x = jnp.maximum(_dot(x, pw1[...]) + pb1[...].astype(jnp.float32), 0.0)
    x = jnp.maximum(_dot(x.astype(dtype), pw2[...]) + pb2[...].astype(jnp.float32), 0.0)
    # scaled positional encoding: + alpha * PE[t] (precomputed row)
    x = (x + pe_ref[...].astype(jnp.float32)).astype(dtype)  # (1, D)

    pos_mask = jax.lax.broadcasted_iota(jnp.int32, (1, n_pos), 1) < t

    for li in range(n_layers):
        # ---------------- self-attention over the cached prefix + current
        resid = x.astype(jnp.float32)
        o = jnp.zeros_like(resid)
        for h in range(n_heads):
            q = (_dot(x, sWq[li, h]) + sbq[li, h].astype(jnp.float32)) * scale
            kn = _dot(x, sWk[li, h]) + sbk[li, h].astype(jnp.float32)
            vn = _dot(x, sWv[li, h]) + sbv[li, h].astype(jnp.float32)
            knew_ref[li, h] = kn.astype(knew_ref.dtype)
            vnew_ref[li, h] = vn.astype(vnew_ref.dtype)
            qb = q.astype(dtype)
            # prefix scores (1, n_pos) against the cache (positions < t)
            s = jax.lax.dot_general(
                qb, kc_ref[li, h], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            s = jnp.where(pos_mask, s, NEG_INF)
            s_cur = jnp.sum(q * kn, axis=1, keepdims=True)  # (1, 1) fp32
            m = jnp.maximum(jnp.max(s, axis=1, keepdims=True), s_cur)
            e = jnp.exp(s - m)
            e_cur = jnp.exp(s_cur - m)
            denom = jnp.sum(e, axis=1, keepdims=True) + e_cur
            ctx = _dot(e.astype(dtype), vc_ref[li, h]) + e_cur * vn
            ctx = ctx / denom  # (1, dh) fp32
            o = o + _dot(ctx.astype(dtype), sWo[li, h])
        o = o + sbo[li][...].astype(jnp.float32)
        x32 = _layer_norm(resid + o, ln_g[li, 0], ln_b[li, 0])
        x = x32.astype(dtype)

        # ---------------- cross-attention over the encoder memory
        resid = x32
        o = jnp.zeros_like(resid)
        for h in range(n_heads):
            q = (_dot(x, cWq[li, h]) + cbq[li, h].astype(jnp.float32)) * scale
            s = jax.lax.dot_general(
                q.astype(dtype), ck_ref[li, h], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            s = s + cross_bias_ref[...].astype(jnp.float32)  # (1, Tp)
            m = jnp.max(s, axis=1, keepdims=True)
            e = jnp.exp(s - m)
            denom_c = jnp.sum(e, axis=1, keepdims=True)
            ctx = _dot(e.astype(dtype), cv_ref[li, h]) / denom_c
            o = o + _dot(ctx.astype(dtype), cWo[li, h])
            if with_attn_pos and li == n_layers - 1:
                pos_acc = pos_acc + jnp.sum(
                    (e / denom_c) * col_f, axis=1, keepdims=True
                )
        o = o + cbo[li][...].astype(jnp.float32)
        x32 = _layer_norm(resid + o, ln_g[li, 1], ln_b[li, 1])
        x = x32.astype(dtype)

        # ---------------- FFN
        h1 = jnp.maximum(_dot(x, W1[li]) + B1[li][...].astype(jnp.float32), 0.0)
        h2 = _dot(h1.astype(dtype), W2[li]) + B2[li][...].astype(jnp.float32)
        x32 = _layer_norm(x32 + h2, ln_g[li, 2], ln_b[li, 2])
        x = x32.astype(dtype)

    y = _dot(x, head_w[...]) + head_b[...].astype(jnp.float32)
    y_ref[...] = y.astype(y_ref.dtype)
    if with_attn_pos:
        pos_ref[...] = pos_acc / n_heads


def decode_step(
    t: jnp.ndarray,  # () int32 — current decoder position
    frame: jnp.ndarray,  # (1, n_mels) fp32 — previous output frame (go at t=0)
    pe_row: jnp.ndarray,  # (1, D) — alpha * PE[t]
    cross_bias: jnp.ndarray,  # (1, Tp) additive key bias
    self_k: jnp.ndarray,  # (L, H, n_pos, dh) cache (positions < t are valid)
    self_v: jnp.ndarray,
    cross_k: jnp.ndarray,  # (L, H, Tp, dh)
    cross_v: jnp.ndarray,
    packed: dict,  # pack_decode_weights output
    interpret: bool = False,
    with_attn_pos: bool = False,
):
    """One full decoder step; returns (y (1, n_mels*r + r) fp32 logits/frame,
    k_new (L, H, dh), v_new (L, H, dh)) — plus, when ``with_attn_pos``,
    the last layer's head-averaged expected cross-attention position
    (1, 1) fp32 for the windowed-monotonic decode's center update."""
    L, H, n_pos, dh = self_k.shape
    d_out = packed["head_w"].shape[1]
    dtype = packed["pw1"].dtype
    scale = dh ** -0.5

    whole = lambda a: pl.BlockSpec(a.shape, lambda i, *_: (0,) * a.ndim)  # noqa: E731
    data = [frame, pe_row, cross_bias, self_k, self_v, cross_k, cross_v]
    weights = [packed[k] for k in _PACK_ORDER]
    out_specs = [
        pl.BlockSpec((1, d_out), lambda i, *_: (0, 0)),
        pl.BlockSpec((L, H, 1, dh), lambda i, *_: (0, 0, 0, 0)),
        pl.BlockSpec((L, H, 1, dh), lambda i, *_: (0, 0, 0, 0)),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((1, d_out), jnp.float32),
        jax.ShapeDtypeStruct((L, H, 1, dh), self_k.dtype),
        jax.ShapeDtypeStruct((L, H, 1, dh), self_v.dtype),
    ]
    if with_attn_pos:
        out_specs.append(pl.BlockSpec((1, 1), lambda i, *_: (0, 0)))
        out_shape.append(jax.ShapeDtypeStruct((1, 1), jnp.float32))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[whole(a) for a in data + weights],
        out_specs=out_specs,
    )
    out = pl.pallas_call(
        functools.partial(
            _kernel, n_layers=L, n_heads=H, scale=scale, dtype=dtype,
            with_attn_pos=with_attn_pos,
        ),
        grid_spec=grid_spec,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT_BYTES
        ),
        interpret=interpret,
    )(t.reshape(1), frame, pe_row, cross_bias, self_k, self_v, cross_k,
      cross_v, *weights)
    return tuple(out)


def decode_step_fits(cfg, n_pos: int, tp: int, batch: int = 1) -> bool:
    """VMEM budget check: operand windows + kernel stack must fit.

    Two separately-capped budgets, calibrated against round-4 on-chip
    compiles (/tmp/r4_mega_numerics.log):

    - The kernel STACK (score/exp temporaries) is bounded by the scoped
      limit we request via ``CompilerParams(vmem_limit_bytes)``.  It is
      dominated by the (B, B*n_pos) fp32 buffers of the unrolled head
      loops — measured 16.84 MiB at B=8, n_pos=1500 (~44 live buffers);
      modeled as 4 MiB + 46 * B^2 * n_pos * 4 B.
    - Operand windows (weights + caches, whole-array BlockSpecs) live
      OUTSIDE the scoped limit but inside the core's 128 MiB VMEM; the
      lane dim pads dh=64 -> 128.  B=4 (~50 MB caches) compiled fine on
      a v5e; combined cap 120 MiB leaves allocator margin.

    ``batch`` scales the cache and stack terms — the batched kernel's
    caches are (L, H, B, T, dh), B times the batch-1 layout, while the
    weights are shared.
    """
    m = cfg.model
    D, F, L, H = m.d_model, m.decoder_d_ffn, m.decoder_n_layers, m.decoder_n_head
    dh = D // H
    dh_pad = max(128, dh)  # lane padding of the head dim
    weights = L * (4 * H * D * dh_pad + 2 * H * dh * D + 2 * D * F) + 2 * D * dh_pad
    caches = 2 * batch * L * H * (n_pos + tp) * dh_pad  # k+v over self (n_pos) + cross (tp)
    stack = 4 * 1024 * 1024 + 46 * batch * batch * n_pos * 4
    total = (weights + caches) * 2 + stack  # bf16 operands
    return (
        stack < _VMEM_LIMIT_BYTES - 1024 * 1024
        and total < 120 * 1024 * 1024
    )


# --------------------------------------------------------------- batched

def expand_cross_bias(cross_bias: jnp.ndarray) -> jnp.ndarray:
    """(B, Tp) additive key bias -> (B, B*Tp) block-diagonal bias for the
    batched kernel's flattened cross-caches: row b keeps its own bias over
    its cache segment [b*Tp, (b+1)*Tp) and NEG_INF everywhere else.

    Loop-invariant across decode steps — callers build it ONCE per
    utterance batch, outside the while_loop."""
    b, tp = cross_bias.shape
    eye = jnp.eye(b, dtype=cross_bias.dtype)  # (B, B)
    full = eye[:, :, None] * cross_bias[None, :, :]  # (B, B, Tp) on-block bias
    off = (1.0 - eye)[:, :, None] * NEG_INF
    return (full + off).reshape(b, b * tp)


def _kernel_batched(
    t_ref,
    frame_ref, pe_ref, cross_bias_ref, kc_ref, vc_ref, ck_ref, cv_ref,
    pw1, pb1, pw2, pb2,
    sWq, sbq, sWk, sbk, sWv, sbv, sWo, sbo,
    cWq, cbq, cWo, cbo,
    W1, B1, W2, B2, ln_g, ln_b,
    head_w, head_b,
    y_ref, knew_ref, vnew_ref, *maybe_pos_ref,
    n_layers, n_heads, n_pos, scale, dtype, with_attn_pos=False,
):
    """Batched (B, ...) variant, restructured after the first lowering
    (leading-batch-dim dot_generals) produced a 5.2 MB MLIR module that
    Mosaic unrolled per batch element and the compile service rejected.

    This version uses ONLY 2-D matmuls — identical op structure to the
    batch-1 kernel, so code size stays ~batch-1 regardless of B:
    caches arrive flattened (L, H, B*T, dh) and each head's attention is
    one (B, dh) x (dh, B*T) score matmul with a BLOCK mask (row b only
    sees columns [b*n_pos, b*n_pos + t)); cross-attention gets the same
    treatment via the precomputed block-diagonal ``expand_cross_bias``.
    The off-block score work is wasted FLOPs ((B-1)x on the attention
    matmuls only) — cheap next to weight streaming at the B<=8 sizes the
    VMEM gate admits."""
    t = t_ref[0]
    b = frame_ref.shape[0]
    bn = kc_ref.shape[2]  # B * n_pos (flattened)
    if with_attn_pos:
        # per-row expected cross-attn position of the LAST layer (head
        # mean).  Column index is measured WITHIN the row's cache block;
        # off-block probabilities are ~0 (block-diagonal bias) so they
        # contribute nothing to the expectation.
        pos_ref = maybe_pos_ref[0]
        bt = ck_ref.shape[2]  # B * Tp
        tp_c = bt // b
        row_c = jax.lax.broadcasted_iota(jnp.int32, (b, bt), 0)
        col_c = jax.lax.broadcasted_iota(jnp.int32, (b, bt), 1)
        colpos_f = (col_c - row_c * tp_c).astype(jnp.float32)
        pos_acc = jnp.zeros((b, 1), jnp.float32)

    x = frame_ref[...].astype(dtype)
    x = jnp.maximum(_dot(x, pw1[...]) + pb1[...].astype(jnp.float32), 0.0)
    x = jnp.maximum(_dot(x.astype(dtype), pw2[...]) + pb2[...].astype(jnp.float32), 0.0)
    x = (x + pe_ref[...].astype(jnp.float32)).astype(dtype)  # (B, D)

    # Row b attends to flattened columns [b*n_pos, b*n_pos + t).
    row = jax.lax.broadcasted_iota(jnp.int32, (b, bn), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (b, bn), 1)
    base = row * n_pos
    pos_mask = (col >= base) & (col < base + t)

    for li in range(n_layers):
        # ---- self-attention: cached prefix + current position, per head
        resid = x.astype(jnp.float32)
        o = jnp.zeros_like(resid)
        for h in range(n_heads):
            q = (_dot(x, sWq[li, h]) + sbq[li, h].astype(jnp.float32)) * scale
            kn = _dot(x, sWk[li, h]) + sbk[li, h].astype(jnp.float32)
            vn = _dot(x, sWv[li, h]) + sbv[li, h].astype(jnp.float32)
            knew_ref[li, h] = kn.astype(knew_ref.dtype)
            vnew_ref[li, h] = vn.astype(vnew_ref.dtype)
            qb = q.astype(dtype)
            s = jax.lax.dot_general(  # (B, B*n_pos) fp32
                qb, kc_ref[li, h], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            s = jnp.where(pos_mask, s, NEG_INF)
            s_cur = jnp.sum(q * kn, axis=1, keepdims=True)  # (B, 1)
            m = jnp.maximum(jnp.max(s, axis=1, keepdims=True), s_cur)
            e = jnp.exp(s - m)
            e_cur = jnp.exp(s_cur - m)  # (B, 1)
            denom = jnp.sum(e, axis=1, keepdims=True) + e_cur
            ctx = _dot(e.astype(dtype), vc_ref[li, h])  # (B, dh)
            ctx = (ctx + e_cur * vn) / denom
            o = o + _dot(ctx.astype(dtype), sWo[li, h])
        o = o + sbo[li][...].astype(jnp.float32)
        x32 = _layer_norm(resid + o, ln_g[li, 0], ln_b[li, 0])
        x = x32.astype(dtype)

        # ---- cross-attention over the encoder memory (block-diag bias
        # carries both padding AND cross-row masking)
        resid = x32
        o = jnp.zeros_like(resid)
        for h in range(n_heads):
            q = (_dot(x, cWq[li, h]) + cbq[li, h].astype(jnp.float32)) * scale
            s = jax.lax.dot_general(  # (B, B*Tp) fp32
                q.astype(dtype), ck_ref[li, h], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            s = s + cross_bias_ref[...].astype(jnp.float32)
            m = jnp.max(s, axis=1, keepdims=True)
            e = jnp.exp(s - m)
            denom_c = jnp.sum(e, axis=1, keepdims=True)
            ctx = _dot(e.astype(dtype), cv_ref[li, h]) / denom_c
            o = o + _dot(ctx.astype(dtype), cWo[li, h])
            if with_attn_pos and li == n_layers - 1:
                pos_acc = pos_acc + jnp.sum(
                    (e / denom_c) * colpos_f, axis=1, keepdims=True
                )
        o = o + cbo[li][...].astype(jnp.float32)
        x32 = _layer_norm(resid + o, ln_g[li, 1], ln_b[li, 1])
        x = x32.astype(dtype)

        # ---- FFN
        h1 = jnp.maximum(_dot(x, W1[li]) + B1[li][...].astype(jnp.float32), 0.0)
        h2 = _dot(h1.astype(dtype), W2[li]) + B2[li][...].astype(jnp.float32)
        x32 = _layer_norm(x32 + h2, ln_g[li, 2], ln_b[li, 2])
        x = x32.astype(dtype)

    y = _dot(x, head_w[...]) + head_b[...].astype(jnp.float32)
    y_ref[...] = y.astype(y_ref.dtype)
    if with_attn_pos:
        pos_ref[...] = pos_acc / n_heads


def decode_step_batched(
    t: jnp.ndarray,  # () int32
    frame: jnp.ndarray,  # (B, n_mels)
    pe_row: jnp.ndarray,  # (1, D)
    cross_bias_exp: jnp.ndarray,  # (B, B*Tp) — expand_cross_bias output
    self_k: jnp.ndarray,  # (L, H, B, n_pos, dh)
    self_v: jnp.ndarray,
    cross_k: jnp.ndarray,  # (L, H, B, Tp, dh)
    cross_v: jnp.ndarray,
    packed: dict,
    interpret: bool = False,
    with_attn_pos: bool = False,
):
    """Batched decode step; returns (y (B, n_mels*r + r), k_new/v_new
    (L, H, B, dh)) — plus, when ``with_attn_pos``, the per-row expected
    cross-attention position (B, 1) fp32 of the last layer.  Caches keep
    the (L, H, B, T, dh) HBM layout the caller scatters into; they are
    view-reshaped to (L, H, B*T, dh) here so the kernel runs pure 2-D
    matmuls (see _kernel_batched)."""
    L, H, b, n_pos, dh = self_k.shape
    tp = cross_k.shape[3]
    d_out = packed["head_w"].shape[1]
    dtype = packed["pw1"].dtype
    scale = dh ** -0.5

    flat = lambda a: a.reshape(L, H, -1, dh)  # noqa: E731 — contiguous, free
    whole = lambda a: pl.BlockSpec(a.shape, lambda i, *_: (0,) * a.ndim)  # noqa: E731
    data = [
        frame, pe_row, cross_bias_exp,
        flat(self_k), flat(self_v), flat(cross_k), flat(cross_v),
    ]
    weights = [packed[k] for k in _PACK_ORDER]
    out_specs = [
        pl.BlockSpec((b, d_out), lambda i, *_: (0, 0)),
        pl.BlockSpec((L, H, b, dh), lambda i, *_: (0, 0, 0, 0)),
        pl.BlockSpec((L, H, b, dh), lambda i, *_: (0, 0, 0, 0)),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((b, d_out), jnp.float32),
        jax.ShapeDtypeStruct((L, H, b, dh), self_k.dtype),
        jax.ShapeDtypeStruct((L, H, b, dh), self_v.dtype),
    ]
    if with_attn_pos:
        out_specs.append(pl.BlockSpec((b, 1), lambda i, *_: (0, 0)))
        out_shape.append(jax.ShapeDtypeStruct((b, 1), jnp.float32))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[whole(a) for a in data + weights],
        out_specs=out_specs,
    )
    out = pl.pallas_call(
        functools.partial(
            _kernel_batched,
            n_layers=L, n_heads=H, n_pos=n_pos, scale=scale, dtype=dtype,
            with_attn_pos=with_attn_pos,
        ),
        grid_spec=grid_spec,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT_BYTES
        ),
        interpret=interpret,
    )(t.reshape(1), *data, *weights)
    return tuple(out)
