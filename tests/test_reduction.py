"""Reduction factor r>1: multi-frame decoding (opt-in, no reference equiv)."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from transformertts_tpu.config import tiny_config
from transformertts_tpu.infer import make_decode_fn, naive_decode, stream_decode
from transformertts_tpu.models import TransformerTTS
from transformertts_tpu.models.tts import shift_right

B, TP, TM, R = 2, 12, 32, 2


def cfg_r(r=R):
    cfg = tiny_config()
    # short Noam warmup so the LR is non-negligible within a few steps
    return cfg.replace(
        model=dataclasses.replace(cfg.model, reduction_factor=r),
        training=dataclasses.replace(cfg.training, warmup_steps=15),
    )


@pytest.fixture(scope="module")
def setup():
    cfg = cfg_r()
    model = TransformerTTS(cfg.model)
    rng = np.random.default_rng(0)
    phoneme = jnp.asarray(rng.integers(1, 60, (B, TP)), jnp.int32)
    mel = jnp.asarray(rng.standard_normal((B, TM, cfg.model.n_mels)), jnp.float32)
    lens_p = jnp.array([TP, TP - 3])
    lens_m = jnp.array([TM, TM - 10])
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        phoneme, mel, lens_p, lens_m, train=False,
    )
    return cfg, model, variables, phoneme, mel, lens_p, lens_m


def test_shift_right_grouped():
    mel = jnp.arange(12, dtype=jnp.float32).reshape(1, 12, 1)
    out = shift_right(mel, r=4)  # 3 groups: inputs go, frame3, frame7
    np.testing.assert_array_equal(np.asarray(out[0, :, 0]), [0.0, 3.0, 7.0])
    # r=1 is the classic shift-right
    np.testing.assert_array_equal(
        np.asarray(shift_right(mel)[0, :, 0]),
        [0.0] + list(range(11)),
    )


def test_forward_shapes_r2(setup):
    cfg, model, variables, phoneme, mel, lens_p, lens_m = setup
    out = model.apply(variables, phoneme, mel, lens_p, lens_m, train=False)
    assert out["pred_melspec"].shape == (B, TM, cfg.model.n_mels)
    assert out["post_melspec"].shape == (B, TM, cfg.model.n_mels)
    assert out["pred_stop"].shape == (B, TM)
    # alignments over decoder positions (T/r), not frames
    assert out["alignments"].shape[-2] == TM // R
    assert np.isfinite(np.asarray(out["pred_melspec"])).all()


def test_group_causality(setup):
    """Frames in group g depend only on input frames < g*r."""
    cfg, model, variables, phoneme, mel, lens_p, lens_m = setup
    q = 3  # perturb from group q onward
    mel2 = mel.at[:, q * R :, :].add(1.0)
    full = jnp.array([TM, TM])
    out1 = model.apply(variables, phoneme, mel, lens_p, full, train=False,
                       return_alignments=False)
    out2 = model.apply(variables, phoneme, mel2, lens_p, full, train=False,
                       return_alignments=False)
    # groups 0..q (frames < (q+1)*r) see identical inputs
    np.testing.assert_allclose(
        np.asarray(out1["pred_melspec"][:, : (q + 1) * R]),
        np.asarray(out2["pred_melspec"][:, : (q + 1) * R]),
        atol=1e-6,
    )
    # later frames must differ
    assert (
        np.abs(
            np.asarray(out1["pred_melspec"][:, (q + 1) * R :])
            - np.asarray(out2["pred_melspec"][:, (q + 1) * R :])
        ).max()
        > 1e-4
    )


def test_cached_equals_naive_r2(setup):
    cfg, model, variables, phoneme, mel, lens_p, lens_m = setup
    max_len = 12
    decode = make_decode_fn(model, cfg, max_len=max_len, stop_threshold=2.0)
    fast = decode(variables, phoneme, lens_p)
    slow = naive_decode(model, variables, phoneme, lens_p, max_len, stop_threshold=2.0)

    assert int(fast["n_frames"]) == max_len
    np.testing.assert_allclose(
        np.asarray(fast["pred_melspec"][:, :max_len]),
        np.asarray(slow["pred_melspec"]),
        atol=2e-4,
    )
    np.testing.assert_allclose(
        np.asarray(fast["pred_stop"][:, :max_len]),
        np.asarray(slow["pred_stop"]),
        atol=2e-4,
    )


def test_stream_matches_oneshot_r2(setup):
    cfg, model, variables, phoneme, mel, lens_p, lens_m = setup
    max_len, chunk = 16, 4
    oneshot = make_decode_fn(model, cfg, max_len=max_len, stop_threshold=2.0)
    ref = jax.device_get(oneshot(variables, phoneme, lens_p))
    chunks = list(stream_decode(model, cfg, variables, np.asarray(phoneme),
                                np.asarray(lens_p), max_len=max_len, chunk=chunk,
                                stop_threshold=2.0))
    pred_all = np.concatenate([p for p, _ in chunks], axis=1)
    assert pred_all.shape[1] == max_len
    np.testing.assert_allclose(pred_all, ref["pred_melspec"][:, :max_len], atol=2e-4)


def test_train_step_r2():
    from transformertts_tpu.train import create_train_state, make_train_step

    cfg = cfg_r()
    model = TransformerTTS(cfg.model)
    rng = np.random.default_rng(1)
    k, b = 1, 2
    batch = {
        "phoneme": rng.integers(1, 60, (k, b, TP)).astype(np.int32),
        "melspec": rng.standard_normal((k, b, TM, cfg.model.n_mels)).astype(np.float32),
        "phoneme_lens": np.full((k, b), TP, np.int32),
        "melspec_lens": np.array([[TM, TM - 9]], np.int32),
    }
    state = create_train_state(model, cfg, jax.random.PRNGKey(0), batch)
    step = make_train_step(model, cfg, scheduled_sampling=False, donate=False)
    rng_key = jax.random.PRNGKey(42)
    first = None
    for i in range(30):
        state, metrics = step(state, batch, 1.0, rng_key)
        if i == 0:
            first = float(metrics["total"])
    last = float(metrics["total"])
    assert np.isfinite(last)
    assert last < first * 0.8, (first, last)

    # the scheduled-sampling double-forward also composes with r>1
    ss_step = make_train_step(model, cfg, scheduled_sampling=True, donate=False)
    _, m = ss_step(state, batch, 0.7, jax.random.PRNGKey(1))
    assert np.isfinite(float(m["total"]))


def test_bucket_validation():
    cfg = cfg_r(3)
    with pytest.raises(ValueError, match="mel_buckets"):
        cfg.validate()
