"""Streaming chunked decode == one-shot decode, including exact postnet."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from transformertts_tpu.config import tiny_config
from transformertts_tpu.infer import make_decode_fn
from transformertts_tpu.infer.streaming import make_stream_fns, stream_decode
from transformertts_tpu.models import TransformerTTS

CFG = tiny_config()
B, TP, MAX_LEN, CHUNK = 2, 12, 16, 4


@pytest.fixture(scope="module")
def setup():
    model = TransformerTTS(CFG.model)
    rng = np.random.default_rng(0)
    phoneme = jnp.asarray(rng.integers(1, 60, (B, TP)), jnp.int32)
    lens = jnp.array([TP, TP - 3])
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        phoneme, jnp.zeros((B, 32, CFG.model.n_mels)), lens, jnp.array([32, 32]),
        train=False,
    )
    return model, variables, phoneme, lens


def test_stream_matches_oneshot(setup):
    model, variables, phoneme, lens = setup
    oneshot = make_decode_fn(model, CFG, max_len=MAX_LEN, stop_threshold=2.0)
    ref = jax.device_get(oneshot(variables, phoneme, lens))

    chunks = list(stream_decode(model, CFG, variables, np.asarray(phoneme),
                                np.asarray(lens), max_len=MAX_LEN, chunk=CHUNK,
                                stop_threshold=2.0))
    pred_all = np.concatenate([p for p, _ in chunks], axis=1)
    post_all = np.concatenate([q for _, q in chunks], axis=1)
    assert pred_all.shape[1] == MAX_LEN and post_all.shape[1] == MAX_LEN
    np.testing.assert_allclose(pred_all, ref["pred_melspec"][:, :MAX_LEN], atol=2e-4)
    # same frames modulo autoregressive drift (~2e-4), amplified by the postnet
    np.testing.assert_allclose(post_all, ref["post_melspec"][:, :MAX_LEN], atol=2e-2)


def test_windowed_postnet_exact(setup):
    """post_fn on clamped windows == full-buffer postnet, given IDENTICAL frames."""
    model, variables, phoneme, lens = setup
    oneshot = make_decode_fn(model, CFG, max_len=MAX_LEN, stop_threshold=2.0)
    ref = jax.device_get(oneshot(variables, phoneme, lens))

    _, _, post_fn = make_stream_fns(model, CFG, max_len=MAX_LEN, chunk=CHUNK,
                                    stop_threshold=2.0)
    frames = np.concatenate(
        [np.zeros((B, 1, CFG.model.n_mels), np.float32),
         ref["pred_melspec"][:, :MAX_LEN]], axis=1)
    for start in range(0, MAX_LEN, CHUNK):
        post = np.asarray(post_fn(variables, jnp.asarray(frames), jnp.int32(start)))
        np.testing.assert_allclose(
            post, ref["post_melspec"][:, start:start + CHUNK], atol=1e-5,
            err_msg=f"chunk at {start}")


def test_stream_generator_early_stop(setup):
    model, variables, phoneme, lens = setup
    # force stop at first frame via stop-head bias surgery
    p = dict(variables["params"])
    p["stop_linear"] = {"Dense_0": {**p["stop_linear"]["Dense_0"],
                                    "bias": jnp.array([100.0])}}
    v2 = dict(variables)
    v2["params"] = p
    chunks = list(stream_decode(model, CFG, v2, np.asarray(phoneme),
                                np.asarray(lens), max_len=MAX_LEN, chunk=CHUNK))
    total = sum(c.shape[1] for c, _ in chunks)
    assert total == 1  # stopped immediately


def test_chunk_divisibility_enforced(setup):
    model, *_ = setup
    with pytest.raises(ValueError, match="multiple of chunk"):
        make_stream_fns(model, CFG, max_len=10, chunk=4)


def test_stream_megakernel_matches_oneshot():
    """Batch-1 streaming through the decode-step megakernel must equal the
    XLA one-shot decode (interpret mode off-TPU)."""
    model = TransformerTTS(CFG.model)
    rng = np.random.default_rng(1)
    phoneme = jnp.asarray(rng.integers(1, 60, (1, TP)), jnp.int32)
    lens = jnp.full((1,), TP, jnp.int32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        phoneme, jnp.zeros((1, 32, CFG.model.n_mels)), lens,
        jnp.full((1,), 32, jnp.int32), train=False,
    )
    oneshot = make_decode_fn(model, CFG, max_len=MAX_LEN, stop_threshold=2.0,
                             use_megakernel=False)
    ref = jax.device_get(oneshot(variables, phoneme, lens))
    chunks = list(stream_decode(model, CFG, variables, np.asarray(phoneme),
                                np.asarray(lens), max_len=MAX_LEN, chunk=CHUNK,
                                stop_threshold=2.0, use_megakernel=True))
    pred_all = np.concatenate([p for p, _ in chunks], axis=1)
    post_all = np.concatenate([q for _, q in chunks], axis=1)
    assert pred_all.shape[1] == MAX_LEN
    np.testing.assert_allclose(pred_all, ref["pred_melspec"][:, :MAX_LEN], atol=5e-4)
    np.testing.assert_allclose(post_all, ref["post_melspec"][:, :MAX_LEN], atol=2e-2)


def test_stream_megakernel_batch_guard():
    model = TransformerTTS(CFG.model)
    rng = np.random.default_rng(2)
    phoneme = jnp.asarray(rng.integers(1, 60, (2, TP)), jnp.int32)
    lens = jnp.full((2,), TP, jnp.int32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        phoneme, jnp.zeros((2, 32, CFG.model.n_mels)), lens,
        jnp.full((2,), 32, jnp.int32), train=False,
    )
    init, _, _ = make_stream_fns(model, CFG, max_len=MAX_LEN, chunk=CHUNK,
                                 use_megakernel=True)
    with pytest.raises(ValueError, match="batch 1"):
        init(variables, phoneme, lens)


def test_stream_windowed_matches_oneshot(setup):
    """decode_attn_window > 0: the window center rides in the stream carry,
    so chunked decode == one-shot windowed decode exactly."""
    import dataclasses

    model, variables, phoneme, lens = setup
    cfg_w = CFG.replace(
        runtime=dataclasses.replace(CFG.runtime, decode_attn_window=2))
    oneshot = make_decode_fn(model, cfg_w, max_len=MAX_LEN, stop_threshold=2.0,
                             use_megakernel=False)
    ref = jax.device_get(oneshot(variables, phoneme, lens))

    chunks = list(stream_decode(model, cfg_w, variables, np.asarray(phoneme),
                                np.asarray(lens), max_len=MAX_LEN, chunk=CHUNK,
                                stop_threshold=2.0, use_megakernel=False))
    pred_all = np.concatenate([p for p, _ in chunks], axis=1)
    n = pred_all.shape[1]
    np.testing.assert_allclose(
        pred_all, np.asarray(ref["pred_melspec"])[:, :n], atol=1e-5)
