"""Streaming (chunked) KV-cached decoding.

Serving-oriented extension (no reference equivalent): decode proceeds in
bounded chunks of frames, yielding audio-ready mel as it goes instead of
waiting for the full utterance.  Built on the same per-layer KV caches as
infer/decode.py — the carry (caches + frame buffer + stop state) round-trips
through a jitted chunk function.

Postnet exactness: the postnet is NON-causal — n_layers convs of kernel k
give a receptive field of ``overlap = n_layers*(k-1)//2`` frames on EACH
side.  A chunk's postnet output therefore needs ``overlap`` frames of
*future* context before it can be finalized.  ``stream_decode`` handles this
by emitting postnet chunks lagged until the decode has advanced ``overlap``
frames past the chunk's end (or the utterance ended).  Each finalized chunk
is computed from a window extended ``overlap`` frames into past and future,
CLAMPED to lie inside ``[0, max_len]``, then trimmed.  The clamping matters:
each conv layer SAME-pads its own input at the window boundary, so a window
edge is only exact where it coincides with the one-shot buffer boundary
(0 or max_len) or has >= overlap frames of final real/zero context inside
the window — zero-extending the *input* past max_len is NOT equivalent to
the per-layer padding the one-shot postnet applies there.  With clamping,
the result is identical to running the postnet over the full max_len buffer
(verified in tests/test_streaming.py).
"""

from __future__ import annotations

from typing import Iterator, Optional

import numpy as np

import jax
import jax.numpy as jnp

from transformertts_tpu.config import Config
from transformertts_tpu.models.tts import TransformerTTS
from transformertts_tpu.models.masks import padding_bias
from transformertts_tpu.infer.decode import _self_bias_at


def postnet_overlap(cfg: Config) -> int:
    """One-sided receptive field of the postnet in frames."""
    return cfg.model.postnet_n_layers * ((cfg.model.postnet_kernel_size - 1) // 2)


def make_stream_fns(
    model: TransformerTTS,
    cfg: Config,
    max_len: Optional[int] = None,
    chunk: int = 64,
    stop_threshold: Optional[float] = None,
    use_megakernel: Optional[bool] = None,
):
    """Returns (init_fn, chunk_fn, post_fn).

    init_fn(variables, phoneme, phoneme_lens) -> carry
    chunk_fn(variables, carry) -> (carry, pred (B, chunk, n_mels), n_new)
        Decodes up to ``chunk`` new pre-postnet frames; frames beyond the
        stop step are zeros and n_new counts the real ones.  ``carry`` is
        donated — keep only the returned one.
    post_fn(variables, frames, start) -> (B, chunk, n_mels)
        Exact postnet output for pred positions [start, start+chunk), valid
        once decode has advanced to ``start + chunk + overlap`` (or ended).
        ``frames`` is ``carry["frames"]``; start is a scalar int array.
    """
    max_len = max_len or cfg.runtime.infer_max_len
    if max_len % chunk:
        raise ValueError(f"max_len ({max_len}) must be a multiple of chunk ({chunk})")
    stop_threshold = (
        stop_threshold if stop_threshold is not None else cfg.runtime.stop_threshold
    )
    n_layers = cfg.model.decoder_n_layers
    n_heads = cfg.model.decoder_n_head
    d_head = cfg.model.d_model // n_heads
    n_mels = cfg.model.n_mels
    overlap = postnet_overlap(cfg)
    r = cfg.model.reduction_factor
    # windowed-monotonic cross-attention (runtime.decode_attn_window): the
    # center is part of the carry, so chunking is transparent — streamed
    # output equals the one-shot windowed decode (tests/test_streaming.py)
    attn_win = int(cfg.runtime.decode_attn_window)
    NEG_INF = -1e9
    if chunk % r:
        raise ValueError(f"chunk ({chunk}) must be a multiple of reduction_factor ({r})")
    n_pos = max_len // r  # decoder positions
    chunk_pos = chunk // r

    def _mega(b, tp):
        """Static choice of the megakernel chunk body (batch-1 TPU path)."""
        from transformertts_tpu.ops.pallas.decode_step import decode_step_fits

        mega = use_megakernel
        if mega is None:
            mega = (
                cfg.runtime.use_pallas_decode_step
                and jax.default_backend() == "tpu"
                and b == 1
                and decode_step_fits(cfg, n_pos, tp)
            )
        elif mega and b != 1:
            raise ValueError("decode-step megakernel supports batch 1 only")
        return mega

    def init(variables, phoneme: jnp.ndarray, phoneme_lens: jnp.ndarray):
        b = phoneme.shape[0]
        bound = model.bind(variables)
        memory = bound.encode(phoneme, None, train=False)
        cross = bound.build_cross_cache(memory)
        dtype = memory.dtype
        base = {
            "t": jnp.zeros((), jnp.int32),  # decoder position (group) counter
            "frames": jnp.zeros((b, max_len + 1, n_mels), jnp.float32),  # [0]=go
            "stopped": jnp.zeros((b,), bool),
        }
        if attn_win > 0:
            base["center"] = jnp.zeros((b,), jnp.float32)
        if _mega(b, phoneme.shape[1]):
            from transformertts_tpu.infer.decode import _mega_context

            packed, pe_table, ck, cv, cbias = _mega_context(
                cfg, variables, memory, cross,
                padding_bias(phoneme_lens, phoneme.shape[1]),
            )
            return {
                **base,
                "self_k": jnp.zeros((n_layers, n_heads, n_pos, d_head), dtype),
                "self_v": jnp.zeros((n_layers, n_heads, n_pos, d_head), dtype),
                "cross_k": ck, "cross_v": cv, "cross_bias": cbias,
                # packed weights + scaled PE ride in the (donated) carry so
                # chunk_fn doesn't repack them every chunk
                "packed": packed, "pe_table": pe_table,
            }
        return {
            **base,
            "self_k": jnp.zeros((n_layers, b, n_pos, n_heads, d_head), dtype),
            "self_v": jnp.zeros((n_layers, b, n_pos, n_heads, d_head), dtype),
            "cross_k": jnp.stack([k for k, _ in cross]),
            "cross_v": jnp.stack([v for _, v in cross]),
            "cross_bias": padding_bias(phoneme_lens, phoneme.shape[1]),
        }

    def _mega_chunk(carry, cond):
        """Megakernel chunk body — carry uses the kernel cache layout and
        already holds the packed weights + scaled PE table (from init)."""
        from transformertts_tpu.infer.decode import _mega_step

        interpret = jax.default_backend() != "tpu"

        def body(s):
            ctx = (s["packed"], s["pe_table"], s["cross_k"], s["cross_v"],
                   s["cross_bias"])
            s2, stop_t = _mega_step(s, ctx, r, n_mels, interpret, attn_win)
            s2["stopped"] = s["stopped"] | jnp.any(
                jax.nn.sigmoid(stop_t) >= stop_threshold, axis=1
            )
            return s2

        return jax.lax.while_loop(cond, body, carry)

    def chunk_fn(variables, carry):
        bound = model.bind(variables)
        start_t = carry["t"]

        def cond(s):
            return (s["t"] < jnp.minimum(start_t + chunk_pos, n_pos)) & ~jnp.all(s["stopped"])

        if carry["self_k"].ndim == 4:  # megakernel cache layout (L, H, n_pos, dh)
            carry = _mega_chunk(carry, cond)
            n_new = (carry["t"] - start_t) * r
            pred = jax.lax.dynamic_slice_in_dim(
                carry["frames"], start_t * r + 1, chunk, axis=1
            )
            return carry, pred, n_new

        def body(s):
            t = s["t"]
            frame = jax.lax.dynamic_slice_in_dim(s["frames"], t * r, 1, axis=1)
            x = bound.prenet_step(frame, t)
            tp = carry["cross_bias"].shape[-1]
            if attn_win > 0:
                # monotone window [center - W, center + W] on every layer's
                # cross-attention — same semantics as infer/decode.py
                pos = jnp.arange(tp, dtype=jnp.float32)[None, :]
                c = s["center"][:, None]
                win = jnp.where(
                    (pos >= c - attn_win) & (pos <= c + attn_win), 0.0, NEG_INF
                )
                cb = carry["cross_bias"] + win[:, None, None, :]
            else:
                cb = carry["cross_bias"]
            self_bias = _self_bias_at(t, n_pos)
            self_k, self_v = s["self_k"], s["self_v"]
            attn_w = None
            for li, layer in enumerate(bound.decoder.layers):
                k_new, v_new = layer.project_self_kv(x)
                self_k = jax.lax.dynamic_update_slice(
                    self_k, k_new[None].astype(self_k.dtype), (li, 0, t, 0, 0)
                )
                self_v = jax.lax.dynamic_update_slice(
                    self_v, v_new[None].astype(self_v.dtype), (li, 0, t, 0, 0)
                )
                last = li == len(bound.decoder.layers) - 1
                if attn_win > 0 and last:
                    x, attn_w = layer.cached_step_attn(
                        x, self_k[li], self_v[li], carry["cross_k"][li],
                        carry["cross_v"][li], self_bias, cb,
                    )
                else:
                    x = layer.cached_step(
                        x, self_k[li], self_v[li], carry["cross_k"][li],
                        carry["cross_v"][li], self_bias, cb,
                    )
            mel_t, stop_t = bound.decode_frame_heads(x)  # (B,r,C), (B,r)
            frames = jax.lax.dynamic_update_slice(
                s["frames"], mel_t.astype(jnp.float32), (0, t * r + 1, 0)
            )
            stopped = s["stopped"] | jnp.any(
                jax.nn.sigmoid(stop_t) >= stop_threshold, axis=1
            )
            new_s = {**s, "t": t + 1, "frames": frames, "stopped": stopped,
                     "self_k": self_k, "self_v": self_v}
            if attn_win > 0:
                w = jnp.mean(attn_w.astype(jnp.float32), axis=1)[:, 0, :]
                pos = jnp.arange(tp, dtype=jnp.float32)[None, :]
                exp_pos = jnp.sum(w * pos, axis=1) / jnp.maximum(
                    jnp.sum(w, axis=1), 1e-6
                )
                new_s["center"] = jnp.maximum(s["center"], exp_pos)
            return new_s

        carry = jax.lax.while_loop(cond, body, carry)
        n_new = (carry["t"] - start_t) * r  # frames emitted this chunk
        pred = jax.lax.dynamic_slice_in_dim(
            carry["frames"], start_t * r + 1, chunk, axis=1
        )
        return carry, pred, n_new

    # static window length; clamped so the window never leaves [0, max_len]
    win_len = min(chunk + 2 * overlap, max_len)

    def post_fn(variables, frames, start):
        bound = model.bind(variables)
        # window ~[start - overlap, start + chunk + overlap), clamped into
        # [0, max_len]: a clamped edge coincides with the one-shot buffer
        # boundary (per-layer conv padding matches); an unclamped edge has
        # >= overlap frames of real context, making the trimmed interior exact
        lo = jnp.clip(start - overlap, 0, max_len - win_len)
        lead = start - lo
        window = jax.lax.dynamic_slice_in_dim(frames, lo + 1, win_len, axis=1)
        post = bound.apply_postnet(window).astype(jnp.float32)
        return jax.lax.dynamic_slice_in_dim(post, lead, chunk, axis=1)

    return jax.jit(init), jax.jit(chunk_fn, donate_argnums=(1,)), jax.jit(post_fn)


def stream_decode(
    model: TransformerTTS,
    cfg: Config,
    variables,
    phoneme: np.ndarray,
    phoneme_lens: np.ndarray,
    max_len: Optional[int] = None,
    chunk: int = 64,
    stop_threshold: Optional[float] = None,
    use_megakernel: Optional[bool] = None,
) -> Iterator[tuple[np.ndarray, np.ndarray]]:
    """Yields aligned (pre_postnet, postnet) chunks of shape (B, <=chunk, n_mels).

    Pre-postnet frames are decoded eagerly; their postnet counterparts are
    finalized (and the pair yielded) once ``overlap`` frames of right context
    exist, so emission lags decode by at most ceil(overlap/chunk) chunks.
    """
    init, chunk_fn, post_fn = make_stream_fns(
        model, cfg, max_len, chunk, stop_threshold, use_megakernel
    )
    overlap = postnet_overlap(cfg)
    carry = init(variables, phoneme, phoneme_lens)
    total = max_len or cfg.runtime.infer_max_len
    pending: list[tuple[int, np.ndarray, int]] = []  # (start, pred, n)
    t = 0
    while True:
        carry, pred, n_new = chunk_fn(variables, carry)
        n = int(jax.device_get(n_new))
        if n:
            pending.append((t, np.asarray(jax.device_get(pred))[:, :n], n))
        t += n
        done = n < chunk or t >= total
        while pending and (done or pending[0][0] + pending[0][2] + overlap <= t):
            s, p, n_p = pending.pop(0)
            post = post_fn(variables, carry["frames"], jnp.int32(s))
            yield p, np.asarray(jax.device_get(post))[:, :n_p]
        if done:
            break
