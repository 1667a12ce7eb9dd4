"""KV-cached autoregressive greedy mel decoding.

The reference re-runs the FULL decoder over all frames generated so far at
every step — O(T^2) decoder invocations with no KV cache, rebuilding masks
each step (ref: model/model.py:354-374).  Here the whole decode is one jitted
``lax.while_loop`` with:

- cross-attention K/V computed ONCE from the encoder memory per layer;
- per-layer self-attention K/V ring buffers of static size ``max_len``,
  updated in place via ``dynamic_update_slice`` (donated, so XLA keeps them
  in HBM without copies);
- the reference's stopping rule: greedy feedback of the PRE-postnet frame,
  stop when ``sigmoid(stop) >= threshold`` for ALL batch rows, cap at
  ``max_len`` (model/model.py:382-384);
- the reference's quirk of running the encoder WITHOUT the source padding
  mask at inference (model/model.py:345-348) is kept (flag);
- postnet applied once at the end over the full buffer (model/model.py:388).

With ``model.reduction_factor == r > 1`` each decoder position emits ``r``
frames (heads sized r*n_mels / r); the loop runs max_len/r steps and feeds
back the LAST frame of the previous group — ~r x fewer decoder invocations
plus an r x shorter self-attention axis.

Matches the reference's math exactly at r=1 (dropout off => recompute ==
cache); ``tests/test_decode.py`` checks cached == naive-recompute
equivalence for both r cases.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from transformertts_tpu.config import Config
from transformertts_tpu.models.masks import NEG_INF, padding_bias
from transformertts_tpu.models.tts import TransformerTTS, shift_right


def _self_bias_at(t: jnp.ndarray, n_pos: int) -> jnp.ndarray:
    """(1, 1, 1, n_pos) bias: cache positions > t are invalid."""
    return jnp.where(jnp.arange(n_pos)[None, None, None, :] <= t, 0.0, NEG_INF)


def per_row_lengths(
    stops: jnp.ndarray,  # (B, max_len) stop logits, NEG_INF at non-decoded frames
    n_frames: jnp.ndarray,  # () global frame count (the reference's cut)
    stop_threshold: float,
) -> jnp.ndarray:
    """Per-utterance usable lengths: frames up to & including each row's own
    first stop vote, bounded by the global stop step.  (The reference only
    has the global cut — decode stops when ALL rows vote, model/model.py:382
    — so short utterances in a batch carry trailing babble; this recovers
    the per-row boundary.)"""
    voted = jax.nn.sigmoid(stops) >= stop_threshold
    first = jnp.argmax(voted, axis=1)  # 0 if no vote
    has_vote = jnp.any(voted, axis=1)
    return jnp.where(has_vote, first + 1, n_frames).astype(jnp.int32)


def _prenet_dropout_step(params, frame, t, rate, key, pe_table, dtype):
    """Decoder prenet with LIVE dropout (fresh masks each step) + scaled PE.

    Mirrors TransformerTTS.prenet_step / DecoderPreNet exactly except the
    two dropouts stay active (keep-prob scaling like flax nn.Dropout).
    The reference disables prenet dropout at inference (model/model.py:342);
    this is the Tacotron-2-style opt-in behind runtime.infer_prenet_dropout."""
    pn = params["dec_prenet"]
    x = frame.astype(dtype)
    for i in range(2):
        lyr = pn[f"LinearNorm_{i}"]["Dense_0"]
        x = jnp.maximum(x @ lyr["kernel"].astype(dtype) + lyr["bias"].astype(dtype), 0)
        keep = jax.random.bernoulli(
            jax.random.fold_in(key, 2 * t + i), 1.0 - rate, x.shape
        )
        x = jnp.where(keep, x / (1.0 - rate), 0.0)
    alpha = params["pe"]["alpha"].astype(jnp.float32)
    pe_row = jax.lax.dynamic_slice_in_dim(pe_table, t, 1, axis=0)  # (1, D)
    return (x.astype(jnp.float32) + alpha * pe_row).astype(dtype)


def make_decode_fn(
    model: TransformerTTS,
    cfg: Config,
    max_len: Optional[int] = None,
    stop_threshold: Optional[float] = None,
    mask_encoder_source: bool = False,
    use_megakernel: Optional[bool] = None,
):
    """Returns jitted fn(variables, phoneme, phoneme_lens) -> dict with
    pred_melspec/post_melspec (B, max_len, n_mels), pred_stop, n_frames.

    Frames at positions >= n_frames are padding (zeros pre-postnet).

    ``use_megakernel``: run each decoder step as ONE Pallas program
    (ops/pallas/decode_step.py) — the single-stream (batch 1) latency fast
    path.  None = auto: on for batch 1 on TPU when the weights+caches fit
    VMEM (``cfg.runtime.use_pallas_decode_step``); True forces it —
    including the EXPERIMENTAL batched kernel for batch > 1 (interpret
    mode off-TPU, for tests); False keeps the XLA per-op loop.
    """
    max_len = max_len or cfg.runtime.infer_max_len
    stop_threshold = (
        stop_threshold if stop_threshold is not None else cfg.runtime.stop_threshold
    )
    n_layers = cfg.model.decoder_n_layers
    n_heads = cfg.model.decoder_n_head
    d_head = cfg.model.d_model // n_heads
    n_mels = cfg.model.n_mels
    r = cfg.model.reduction_factor
    if max_len % r:
        raise ValueError(f"max_len ({max_len}) must be a multiple of reduction_factor ({r})")
    n_pos = max_len // r  # decoder positions

    def decode(variables, phoneme: jnp.ndarray, phoneme_lens: jnp.ndarray):
        b = phoneme.shape[0]
        bound = model.bind(variables)

        # encoder once; reference runs it unmasked at inference
        memory = bound.encode(
            phoneme, phoneme_lens if mask_encoder_source else None, train=False
        )
        cross_kv = bound.build_cross_cache(memory)  # L x ((B,Tp,H,Dh) x2)
        cross_bias = padding_bias(phoneme_lens, phoneme.shape[1])

        dtype = memory.dtype

        from transformertts_tpu.ops.pallas.decode_step import decode_step_fits

        on_tpu = jax.default_backend() == "tpu"
        pdrop = float(cfg.runtime.infer_prenet_dropout)
        attn_win = int(cfg.runtime.decode_attn_window)
        mega = use_megakernel
        if mega is None:
            mega = (
                cfg.runtime.use_pallas_decode_step
                and on_tpu
                and pdrop == 0.0  # live-dropout prenet is XLA-loop only
                and b <= cfg.runtime.decode_megakernel_max_batch
                and decode_step_fits(cfg, n_pos, phoneme.shape[1], batch=b)
            )
        if mega and pdrop > 0.0:
            raise ValueError(
                "runtime.infer_prenet_dropout requires the XLA decode loop "
                "(use_megakernel must not be forced True)"
            )
        spec_k = int(cfg.runtime.decode_speculative_k)
        if spec_k > 1:
            if pdrop > 0.0 or attn_win > 0:
                raise ValueError(
                    "decode_speculative_k is incompatible with "
                    "infer_prenet_dropout / decode_attn_window"
                )
            if use_megakernel:
                raise ValueError(
                    "decode_speculative_k uses the XLA chunk loop "
                    "(use_megakernel must not be forced True)"
                )
            if b == 1:  # single-stream latency path only; batches fall through
                if n_pos + spec_k - 1 > cfg.model.max_len:
                    # the chunk reads PE rows [t, t+K); a start past the
                    # table end would CLAMP (dynamic_slice semantics) and
                    # silently shift even position 0's encoding, which is
                    # always accepted
                    raise ValueError(
                        f"max_len/r + decode_speculative_k - 1 "
                        f"({n_pos + spec_k - 1}) must be <= model.max_len "
                        f"({cfg.model.max_len})"
                    )
                return _speculative_decode(
                    bound, cfg, cross_kv, cross_bias, dtype,
                    n_pos, max_len, stop_threshold, spec_k,
                    float(cfg.runtime.decode_speculative_tau),
                )
        if mega and b > 1:
            # batched kernel — auto-gated by decode_megakernel_max_batch
            # (default 8 since the round-3 hardware A/B: 2.2-2.9x vs the
            # XLA loop at B=1..8, ab_decode_batched.json / PERF.md)
            return _megakernel_decode_batched(
                model, cfg, variables, bound, memory, cross_kv, cross_bias,
                n_pos, max_len, stop_threshold, interpret=not on_tpu,
                attn_win=attn_win,
            )
        if mega:
            return _megakernel_decode(
                model, cfg, variables, bound, memory, cross_kv, cross_bias,
                n_pos, max_len, stop_threshold, interpret=not on_tpu,
                attn_win=attn_win,
            )
        init = {
            "t": jnp.zeros((), jnp.int32),  # decoder position (group) counter
            "frames": jnp.zeros((b, max_len + 1, n_mels), jnp.float32),  # [0]=go
            "stops": jnp.full((b, max_len), NEG_INF, jnp.float32),
            "stopped": jnp.zeros((b,), bool),
            "self_k": jnp.zeros((n_layers, b, n_pos, n_heads, d_head), dtype),
            "self_v": jnp.zeros((n_layers, b, n_pos, n_heads, d_head), dtype),
        }
        if attn_win > 0:
            # monotone attention center per row (phoneme index, fractional)
            init["center"] = jnp.zeros((b,), jnp.float32)

        def cond(s):
            return (s["t"] < n_pos) & ~jnp.all(s["stopped"])

        if pdrop > 0.0:
            from transformertts_tpu.models.modules import sinusoid_table

            pe_table = jnp.asarray(
                sinusoid_table(cfg.model.max_len, cfg.model.d_model)
            )
            pdrop_key = jax.random.PRNGKey(cfg.training.seed ^ 0x5EED)

        def body(s):
            t = s["t"]
            # input: go frame at t=0, else last frame of the previous group
            frame = jax.lax.dynamic_slice_in_dim(s["frames"], t * r, 1, axis=1)
            if pdrop > 0.0:
                x = _prenet_dropout_step(
                    variables["params"], frame, t, pdrop, pdrop_key,
                    pe_table, dtype,
                )
            else:
                x = bound.prenet_step(frame, t)  # (B, 1, D)

            if attn_win > 0:
                # restrict every layer's cross-attention to the monotone
                # window [center - W, center + W] (plus the padding bias)
                pos = jnp.arange(phoneme.shape[1], dtype=jnp.float32)[None, :]
                c = s["center"][:, None]
                win = jnp.where(
                    (pos >= c - attn_win) & (pos <= c + attn_win), 0.0, NEG_INF
                )
                cb = cross_bias + win[:, None, None, :]
            else:
                cb = cross_bias

            self_bias = _self_bias_at(t, n_pos)
            self_k, self_v = s["self_k"], s["self_v"]
            attn_w = None
            for li, layer in enumerate(bound.decoder.layers):
                k_new, v_new = layer.project_self_kv(x)  # (B,1,H,Dh)
                self_k = jax.lax.dynamic_update_slice(
                    self_k, k_new[None].astype(self_k.dtype), (li, 0, t, 0, 0)
                )
                self_v = jax.lax.dynamic_update_slice(
                    self_v, v_new[None].astype(self_v.dtype), (li, 0, t, 0, 0)
                )
                ck, cv = cross_kv[li]
                last = li == len(bound.decoder.layers) - 1
                if attn_win > 0 and last:
                    x, attn_w = layer.cached_step_attn(
                        x, self_k[li], self_v[li], ck, cv, self_bias, cb
                    )
                else:
                    x = layer.cached_step(
                        x, self_k[li], self_v[li], ck, cv, self_bias, cb
                    )

            mel_t, stop_t = bound.decode_frame_heads(x)  # (B,r,C), (B,r)
            frames = jax.lax.dynamic_update_slice(
                s["frames"], mel_t.astype(jnp.float32), (0, t * r + 1, 0)
            )
            stops = jax.lax.dynamic_update_slice(
                s["stops"], stop_t.astype(jnp.float32), (0, t * r)
            )
            stopped = s["stopped"] | jnp.any(
                jax.nn.sigmoid(stop_t) >= stop_threshold, axis=1
            )
            new_s = {
                "t": t + 1,
                "frames": frames,
                "stops": stops,
                "stopped": stopped,
                "self_k": self_k,
                "self_v": self_v,
            }
            if attn_win > 0:
                # attention expectation within the window, averaged over
                # heads; the center only ever moves FORWARD
                w = jnp.mean(attn_w.astype(jnp.float32), axis=1)[:, 0, :]  # (B, Tp)
                pos = jnp.arange(phoneme.shape[1], dtype=jnp.float32)[None, :]
                exp_pos = jnp.sum(w * pos, axis=1) / jnp.maximum(
                    jnp.sum(w, axis=1), 1e-6
                )
                new_s["center"] = jnp.maximum(s["center"], exp_pos)
            return new_s

        final = jax.lax.while_loop(cond, body, init)
        n_frames = final["t"] * r
        pred = final["frames"][:, 1:, :]  # drop go frame
        # zero garbage-free: positions >= n_frames are already zeros
        post = bound.apply_postnet(pred).astype(jnp.float32)
        return {
            "pred_melspec": pred,
            "post_melspec": post,
            "pred_stop": final["stops"],
            "n_frames": n_frames,
            "n_frames_per_row": per_row_lengths(
                final["stops"], n_frames, stop_threshold
            ),
        }

    return jax.jit(decode)


def _speculative_decode(
    bound, cfg, cross_kv, cross_bias, dtype,
    n_pos, max_len, stop_threshold, spec_k, tau,
):
    """Draft-extrapolate + chunk-verify decode (batch 1, XLA path).

    Replaces the per-frame sequential loop (the reference re-runs the
    whole decoder once per frame, model/model.py:354-374; our XLA loop
    runs one cached step per frame) with a speculative loop over groups:

    1. draft the next ``spec_k - 1`` decoder INPUT frames by linear
       extrapolation of the mel trajectory (stride = reduction_factor) —
       mel spectrograms are smooth, so a zero-cost draft is often right;
    2. run the decoder ONCE over all ``spec_k`` positions: each layer
       first writes the chunk's K/V rows into the cache, then attends
       with a per-row bias admitting positions <= t + row, so position j
       is computed exactly as if its drafted input were real;
    3. accept the leading run of positions whose drafted input matched
       the verified output of the previous position within ``tau``
       (max-abs over mel bins, normalized units), and advance by the
       accepted count m.

    Position 0 of every chunk uses the TRUE previous frame, so m >= 1
    per pass and tau=0 degenerates to the exact sequential decode at one
    group per pass (pinned in tests/test_decode.py).  Accepted outputs
    beyond position 0 were computed from inputs within tau of exact — a
    bounded input perturbation, not bit-exact decode; free-running
    quality deltas are measured on-chip before any default changes.

    Layout: ``spec_k`` padding rows/frames beyond n_pos keep every
    dynamic_update_slice in-bounds (XLA clamps out-of-range starts, and
    clamping would silently corrupt earlier rows); rejected chunk
    positions are written as zeros / NEG_INF so the zero-tail invariant
    the postnet relies on survives.
    """
    m_cfg = cfg.model
    n_layers, n_heads = m_cfg.decoder_n_layers, m_cfg.decoder_n_head
    d_head = m_cfg.d_model // n_heads
    n_mels, r = m_cfg.n_mels, m_cfg.reduction_factor
    draft_linear = cfg.runtime.decode_speculative_draft == "linear"
    K = spec_k
    cap = n_pos + K  # padded cache/buffer capacity (groups)
    b = 1
    init = {
        "t": jnp.zeros((), jnp.int32),
        "frames": jnp.zeros((b, cap * r + 1, n_mels), jnp.float32),
        "stops": jnp.full((b, cap * r), NEG_INF, jnp.float32),
        "stopped": jnp.zeros((b,), bool),
        "self_k": jnp.zeros((n_layers, b, cap, n_heads, d_head), dtype),
        "self_v": jnp.zeros((n_layers, b, cap, n_heads, d_head), dtype),
        "passes": jnp.zeros((), jnp.int32),
    }

    def cond(s):
        return (s["t"] < n_pos) & ~jnp.all(s["stopped"])

    rows = jnp.arange(K)
    cols = jnp.arange(cap)

    def body(s):
        t = s["t"]
        f0 = jax.lax.dynamic_slice(
            s["frames"], (0, t * r, 0), (b, 1, n_mels)
        )
        prev = jax.lax.dynamic_slice(
            s["frames"], (0, jnp.maximum(t * r - r, 0), 0), (b, 1, n_mels)
        )
        # draft: "linear" extrapolates at the input stride ("hold" zeroes
        # the slope and repeats f0); at t=0 prev==f0 (the go frame), so
        # drafts are constant either way — harmless, they are verified
        # like any other draft.
        slope = (f0 - prev) if draft_linear else jnp.zeros_like(f0)
        j = jnp.arange(K, dtype=jnp.float32)[None, :, None]
        inputs = f0 + j * slope  # (1, K, n_mels); j=0 is the true input
        x = bound.prenet_step(inputs, t)  # (1, K, D)

        # per-row causal bias over the padded cache: row j sees <= t+j
        bias = jnp.where(
            cols[None, :] <= t + rows[:, None], 0.0, NEG_INF
        )[None, None]  # (1, 1, K, cap)

        self_k, self_v = s["self_k"], s["self_v"]
        for li, layer in enumerate(bound.decoder.layers):
            k_new, v_new = layer.project_self_kv(x)  # (1, K, H, Dh)
            self_k = jax.lax.dynamic_update_slice(
                self_k, k_new[None].astype(self_k.dtype), (li, 0, t, 0, 0)
            )
            self_v = jax.lax.dynamic_update_slice(
                self_v, v_new[None].astype(self_v.dtype), (li, 0, t, 0, 0)
            )
            ck, cv = cross_kv[li]
            x = layer.cached_step(
                x, self_k[li], self_v[li], ck, cv, bias, cross_bias
            )

        mel_out, stop_out = bound.decode_frame_heads(x)  # (1,K*r,C),(1,K*r)
        mel32 = mel_out.astype(jnp.float32)

        # verify: draft_j vs the verified last frame of group j-1
        drafts = inputs[:, 1:, :].astype(jnp.float32)  # (1, K-1, C)
        actual = mel32[:, r - 1:(K - 1) * r:r, :]      # (1, K-1, C)
        ok = jnp.max(jnp.abs(drafts - actual), axis=2) <= tau  # (1, K-1)
        m = 1 + jnp.sum(jnp.cumprod(ok.astype(jnp.int32), axis=1))

        # stop votes truncate acceptance at the first voting group
        gstop = jnp.any(
            jax.nn.sigmoid(stop_out.reshape(b, K, r)) >= stop_threshold,
            axis=2,
        )  # (1, K)
        voted = gstop[0] & (jnp.arange(K) < m)
        any_vote = jnp.any(voted)
        first = jnp.argmax(voted)
        m = jnp.where(any_vote, jnp.minimum(m, first + 1), m)
        m = jnp.minimum(m, n_pos - t)  # never advance past n_pos

        fmask = (jnp.arange(K * r) < m * r)[None, :, None]
        frames = jax.lax.dynamic_update_slice(
            s["frames"], jnp.where(fmask, mel32, 0.0), (0, t * r + 1, 0)
        )
        smask = (jnp.arange(K * r) < m * r)[None, :]
        stops = jax.lax.dynamic_update_slice(
            s["stops"],
            jnp.where(smask, stop_out.astype(jnp.float32), NEG_INF),
            (0, t * r),
        )
        return {
            "t": t + m,
            "frames": frames,
            "stops": stops,
            "stopped": s["stopped"] | any_vote[None],
            "self_k": self_k,
            "self_v": self_v,
            "passes": s["passes"] + 1,
        }

    final = jax.lax.while_loop(cond, body, init)
    n_frames = final["t"] * r
    pred = final["frames"][:, 1:max_len + 1, :]
    stops = final["stops"][:, :max_len]
    post = bound.apply_postnet(pred).astype(jnp.float32)
    return {
        "pred_melspec": pred,
        "post_melspec": post,
        "pred_stop": stops,
        "n_frames": n_frames,
        "n_frames_per_row": per_row_lengths(
            stops, n_frames, stop_threshold
        ),
        "n_verify_passes": final["passes"],
    }



def _mega_context(cfg, variables, memory, cross_kv, cross_bias):
    """Kernel-layout weights/caches shared by one-shot + streaming decode."""
    from transformertts_tpu.models.modules import sinusoid_table
    from transformertts_tpu.ops.pallas.decode_step import pack_decode_weights

    packed = pack_decode_weights(variables["params"], cfg, dtype=memory.dtype)
    alpha = variables["params"]["pe"]["alpha"].astype(jnp.float32)
    pe_table = (
        alpha * jnp.asarray(sinusoid_table(cfg.model.max_len, cfg.model.d_model))
    ).astype(jnp.float32)
    # (L, H, Tp, dh) cross caches, batch squeezed
    ck = jnp.stack([kv[0][0] for kv in cross_kv]).transpose(0, 2, 1, 3)
    cv = jnp.stack([kv[1][0] for kv in cross_kv]).transpose(0, 2, 1, 3)
    # padding_bias is broadcast-shaped (B, 1, 1, Tp) — the kernel wants (1, Tp)
    cbias = cross_bias[:1].reshape(1, -1).astype(jnp.float32)
    return packed, pe_table, ck, cv, cbias


def _mega_step(s, ctx, r, n_mels, interpret, attn_win=0):
    """One megakernel decode step over state dict ``s`` (t/frames/stops/
    stopped/self_k/self_v, + center when ``attn_win`` > 0); returns the
    updated state.  With ``attn_win``, the monotone window bias is folded
    into the cross bias per step and the kernel reports the last layer's
    expected attention position for the center update — same semantics as
    the XLA windowed loop above."""
    from transformertts_tpu.ops.pallas.decode_step import decode_step

    packed, pe_table, ck, cv, cbias = ctx
    t = s["t"]
    frame = jax.lax.dynamic_slice_in_dim(s["frames"], t * r, 1, axis=1)[:, 0]
    pe_row = jax.lax.dynamic_slice_in_dim(pe_table, t, 1, axis=0)
    if attn_win > 0:
        pos = jax.lax.broadcasted_iota(jnp.float32, (1, cbias.shape[1]), 1)
        c = s["center"].reshape(1, 1)
        cb_t = cbias + jnp.where(
            (pos >= c - attn_win) & (pos <= c + attn_win), 0.0, NEG_INF
        )
        y, k_new, v_new, exp_pos = decode_step(
            t, frame, pe_row, cb_t, s["self_k"], s["self_v"], ck, cv,
            packed, interpret=interpret, with_attn_pos=True,
        )
    else:
        y, k_new, v_new = decode_step(
            t, frame, pe_row, cbias, s["self_k"], s["self_v"], ck, cv,
            packed, interpret=interpret,
        )
    mel_t = y[:, : n_mels * r].reshape(1, r, n_mels)
    stop_t = y[:, n_mels * r :]
    new_s = {
        **s,
        "t": t + 1,
        "frames": jax.lax.dynamic_update_slice(
            s["frames"], mel_t, (0, t * r + 1, 0)
        ),
        "self_k": jax.lax.dynamic_update_slice(s["self_k"], k_new, (0, 0, t, 0)),
        "self_v": jax.lax.dynamic_update_slice(s["self_v"], v_new, (0, 0, t, 0)),
    }
    if attn_win > 0:
        new_s["center"] = jnp.maximum(s["center"], exp_pos.reshape(1))
    return new_s, stop_t


def _megakernel_decode(
    model, cfg, variables, bound, memory, cross_kv, cross_bias,
    n_pos, max_len, stop_threshold, interpret, attn_win=0,
):
    """Batch-1 decode where each step is ONE Pallas program
    (ops/pallas/decode_step.py).  Per-step XLA work shrinks to the kernel
    plus a handful of slice/update ops (PE row, frame fetch, cache writes,
    stop check).  ``attn_win`` > 0 adds the windowed-monotonic
    cross-attention of the XLA loop (the flagship.yaml operating point)
    without leaving the kernel fast path."""
    n_mels = cfg.model.n_mels
    r = cfg.model.reduction_factor
    n_layers = cfg.model.decoder_n_layers
    n_heads = cfg.model.decoder_n_head
    d_head = cfg.model.d_model // n_heads
    dtype = memory.dtype

    ctx = _mega_context(cfg, variables, memory, cross_kv, cross_bias)

    init = {
        "t": jnp.zeros((), jnp.int32),
        "frames": jnp.zeros((1, max_len + 1, n_mels), jnp.float32),
        "stops": jnp.full((1, max_len), NEG_INF, jnp.float32),
        "stopped": jnp.zeros((1,), bool),
        "self_k": jnp.zeros((n_layers, n_heads, n_pos, d_head), dtype),
        "self_v": jnp.zeros((n_layers, n_heads, n_pos, d_head), dtype),
    }
    if attn_win > 0:
        init["center"] = jnp.zeros((1,), jnp.float32)

    def cond(s):
        return (s["t"] < n_pos) & ~jnp.all(s["stopped"])

    def body(s):
        t = s["t"]
        s2, stop_t = _mega_step(s, ctx, r, n_mels, interpret, attn_win)
        s2["stops"] = jax.lax.dynamic_update_slice(s["stops"], stop_t, (0, t * r))
        s2["stopped"] = s["stopped"] | jnp.any(
            jax.nn.sigmoid(stop_t) >= stop_threshold, axis=1
        )
        return s2

    final = jax.lax.while_loop(cond, body, init)
    n_frames = final["t"] * r
    pred = final["frames"][:, 1:, :]
    post = bound.apply_postnet(pred).astype(jnp.float32)
    return {
        "pred_melspec": pred,
        "post_melspec": post,
        "pred_stop": final["stops"],
        "n_frames": n_frames,
        "n_frames_per_row": per_row_lengths(final["stops"], n_frames, stop_threshold),
    }


def _megakernel_decode_batched(
    model, cfg, variables, bound, memory, cross_kv, cross_bias,
    n_pos, max_len, stop_threshold, interpret, attn_win=0,
):
    """Batched (B > 1) megakernel decode — forced-only until benchmarked.

    Caches live in the kernel's (L, H, B, T, dh) layout; semantics match
    the XLA loop (global all-rows stop vote, per-row lengths recovered
    after; per-row monotone window when ``attn_win`` > 0)."""
    from transformertts_tpu.models.modules import sinusoid_table
    from transformertts_tpu.ops.pallas.decode_step import (
        decode_step_batched,
        expand_cross_bias,
        pack_decode_weights,
    )

    n_mels = cfg.model.n_mels
    r = cfg.model.reduction_factor
    n_layers = cfg.model.decoder_n_layers
    n_heads = cfg.model.decoder_n_head
    d_head = cfg.model.d_model // n_heads
    dtype = memory.dtype
    b = memory.shape[0]

    packed = pack_decode_weights(variables["params"], cfg, dtype=dtype)
    alpha = variables["params"]["pe"]["alpha"].astype(jnp.float32)
    pe_table = (
        alpha * jnp.asarray(sinusoid_table(cfg.model.max_len, cfg.model.d_model))
    ).astype(jnp.float32)
    # (L, B, Tp, H, dh) -> (L, H, B, Tp, dh)
    ck = jnp.stack([kv[0] for kv in cross_kv]).transpose(0, 3, 1, 2, 4)
    cv = jnp.stack([kv[1] for kv in cross_kv]).transpose(0, 3, 1, 2, 4)
    # (B, Tp) -> block-diagonal (B, B*Tp); loop-invariant, built once here
    cbias = expand_cross_bias(cross_bias[:, 0, 0, :].astype(jnp.float32))
    tp = ck.shape[3]
    if attn_win > 0:
        # per-row column index WITHIN the row's block, for the per-step
        # window bias; off-block columns are already NEG_INF in cbias so
        # any window leak across blocks stays masked
        row_i = jax.lax.broadcasted_iota(jnp.int32, (b, b * tp), 0)
        col_i = jax.lax.broadcasted_iota(jnp.int32, (b, b * tp), 1)
        colpos = (col_i - row_i * tp).astype(jnp.float32)

    init = {
        "t": jnp.zeros((), jnp.int32),
        "frames": jnp.zeros((b, max_len + 1, n_mels), jnp.float32),
        "stops": jnp.full((b, max_len), NEG_INF, jnp.float32),
        "stopped": jnp.zeros((b,), bool),
        "self_k": jnp.zeros((n_layers, n_heads, b, n_pos, d_head), dtype),
        "self_v": jnp.zeros((n_layers, n_heads, b, n_pos, d_head), dtype),
    }
    if attn_win > 0:
        init["center"] = jnp.zeros((b,), jnp.float32)

    def cond(s):
        return (s["t"] < n_pos) & ~jnp.all(s["stopped"])

    def body(s):
        t = s["t"]
        frame = jax.lax.dynamic_slice_in_dim(s["frames"], t * r, 1, axis=1)[:, 0]
        pe_row = jax.lax.dynamic_slice_in_dim(pe_table, t, 1, axis=0)
        if attn_win > 0:
            c = s["center"][:, None]
            cb_t = cbias + jnp.where(
                (colpos >= c - attn_win) & (colpos <= c + attn_win),
                0.0, NEG_INF,
            )
            y, k_new, v_new, exp_pos = decode_step_batched(
                t, frame, pe_row, cb_t, s["self_k"], s["self_v"], ck, cv,
                packed, interpret=interpret, with_attn_pos=True,
            )
        else:
            y, k_new, v_new = decode_step_batched(
                t, frame, pe_row, cbias, s["self_k"], s["self_v"], ck, cv,
                packed, interpret=interpret,
            )
        mel_t = y[:, : n_mels * r].reshape(b, r, n_mels)
        stop_t = y[:, n_mels * r :]
        new_s = {
            "t": t + 1,
            "frames": jax.lax.dynamic_update_slice(
                s["frames"], mel_t, (0, t * r + 1, 0)
            ),
            "stops": jax.lax.dynamic_update_slice(s["stops"], stop_t, (0, t * r)),
            "stopped": s["stopped"] | jnp.any(
                jax.nn.sigmoid(stop_t) >= stop_threshold, axis=1
            ),
            "self_k": jax.lax.dynamic_update_slice(
                s["self_k"], k_new[:, :, :, None, :], (0, 0, 0, t, 0)
            ),
            "self_v": jax.lax.dynamic_update_slice(
                s["self_v"], v_new[:, :, :, None, :], (0, 0, 0, t, 0)
            ),
        }
        if attn_win > 0:
            new_s["center"] = jnp.maximum(s["center"], exp_pos[:, 0])
        return new_s

    final = jax.lax.while_loop(cond, body, init)
    n_frames = final["t"] * r
    pred = final["frames"][:, 1:, :]
    post = bound.apply_postnet(pred).astype(jnp.float32)
    return {
        "pred_melspec": pred,
        "post_melspec": post,
        "pred_stop": final["stops"],
        "n_frames": n_frames,
        "n_frames_per_row": per_row_lengths(final["stops"], n_frames, stop_threshold),
    }


def naive_decode(
    model: TransformerTTS,
    variables,
    phoneme: jnp.ndarray,
    phoneme_lens: jnp.ndarray,
    max_len: int,
    stop_threshold: float = 0.5,
):
    """Cacheless re-compute decode mirroring the reference's inference loop
    (model/model.py:354-374), generalized to reduction_factor.  Slow
    (recompiles per length) — used as the equivalence oracle in tests."""
    bound = model.bind(variables)
    memory = bound.encode(phoneme, None, train=False)
    b = phoneme.shape[0]
    r = model.cfg.reduction_factor
    assert max_len % r == 0
    mel = jnp.zeros((b, 0, model.cfg.n_mels), jnp.float32)  # emitted frames
    stops = []
    for g in range(1, max_len // r + 1):
        # full decoder over the emitted prefix; shift_right-grouped inputs
        pad = jnp.zeros((b, g * r - mel.shape[1], model.cfg.n_mels), jnp.float32)
        tgt_in = shift_right(jnp.concatenate([mel, pad], axis=1), r)
        tgt_out, _ = bound.decode(
            memory, tgt_in, phoneme_lens,
            jnp.full((b,), g * r, jnp.int32), train=False, return_alignments=False,
        )
        mel_g, stop_g = bound.decode_frame_heads(tgt_out[:, -1:, :])  # (B,r,C),(B,r)
        mel = jnp.concatenate([mel, mel_g.astype(jnp.float32)], axis=1)
        stops.append(stop_g.astype(jnp.float32))
        if bool(jnp.all(jnp.any(jax.nn.sigmoid(stop_g) >= stop_threshold, axis=1))):
            break
    post = bound.apply_postnet(mel).astype(jnp.float32)
    return {
        "pred_melspec": mel,
        "post_melspec": post,
        "pred_stop": jnp.concatenate(stops, axis=1),
        "n_frames": mel.shape[1],
    }
