import jax
import jax.numpy as jnp
import numpy as np
import pytest

from transformertts_tpu.config import tiny_config
from transformertts_tpu.models import TransformerTTS
from transformertts_tpu.models.modules import sinusoid_table
from transformertts_tpu.models.tts import shift_right

CFG = tiny_config().model
B, TP, TM = 2, 16, 64


@pytest.fixture(scope="module")
def model_and_vars():
    model = TransformerTTS(CFG)
    rng = jax.random.PRNGKey(0)
    phoneme = jnp.zeros((B, TP), jnp.int32)
    mel = jnp.zeros((B, TM, CFG.n_mels), jnp.float32)
    lens_p = jnp.array([TP, TP - 4])
    lens_m = jnp.array([TM, TM - 10])
    variables = model.init(
        {"params": rng, "dropout": jax.random.PRNGKey(1)},
        phoneme, mel, lens_p, lens_m, train=False,
    )
    return model, variables


def test_forward_shapes(model_and_vars):
    model, variables = model_and_vars
    phoneme = jnp.ones((B, TP), jnp.int32)
    mel = jnp.ones((B, TM, CFG.n_mels), jnp.float32)
    out = model.apply(
        variables, phoneme, mel, jnp.array([TP, 10]), jnp.array([TM, 32]), train=False
    )
    assert out["pred_melspec"].shape == (B, TM, CFG.n_mels)
    assert out["post_melspec"].shape == (B, TM, CFG.n_mels)
    assert out["pred_stop"].shape == (B, TM)
    assert out["alignments"].shape == (CFG.decoder_n_layers, B, CFG.decoder_n_head, TM, TP)
    for v in out.values():
        assert np.isfinite(np.asarray(v)).all()


def test_shift_right():
    mel = jnp.arange(12, dtype=jnp.float32).reshape(1, 4, 3)
    shifted = shift_right(mel)
    assert (np.asarray(shifted[0, 0]) == 0).all()
    np.testing.assert_array_equal(np.asarray(shifted[0, 1:]), np.asarray(mel[0, :-1]))


def test_causality(model_and_vars):
    """Changing future mel frames must not affect earlier predictions."""
    model, variables = model_and_vars
    phoneme = jnp.ones((B, TP), jnp.int32)
    rng = np.random.default_rng(0)
    mel = jnp.asarray(rng.standard_normal((B, TM, CFG.n_mels)), jnp.float32)
    lens_p, lens_m = jnp.array([TP, TP]), jnp.array([TM, TM])

    out1 = model.apply(variables, phoneme, mel, lens_p, lens_m, train=False)
    mel2 = mel.at[:, TM // 2 :, :].add(100.0)
    out2 = model.apply(variables, phoneme, mel2, lens_p, lens_m, train=False)
    # frame t attends to inputs up to t-1 => predictions up to TM//2 unchanged
    np.testing.assert_allclose(
        np.asarray(out1["pred_melspec"][:, : TM // 2]),
        np.asarray(out2["pred_melspec"][:, : TM // 2]),
        atol=1e-4,
    )
    assert (
        np.abs(
            np.asarray(out1["pred_melspec"][:, TM // 2 + 1 :])
            - np.asarray(out2["pred_melspec"][:, TM // 2 + 1 :])
        ).max()
        > 1e-3
    )


def test_mel_padding_invariance(model_and_vars):
    """Scribbling on padded MEL frames must not change valid pred_melspec.

    (Phoneme padding does NOT have this invariant — the conv prenet leaks
    pad content into valid positions before masked attention, exactly as in
    the reference; post_melspec also leaks near the boundary via postnet
    convs.  The causal decoder path is the true invariant.)
    """
    model, variables = model_and_vars
    rng = np.random.default_rng(1)
    phon = jnp.asarray(rng.integers(1, 50, (B, TP)), jnp.int32)
    mel = jnp.asarray(rng.standard_normal((B, TM, CFG.n_mels)), jnp.float32)
    lens_p = jnp.array([TP, TP])
    valid_m = TM - 20
    lens_m = jnp.array([valid_m, valid_m])

    out1 = model.apply(variables, phon, mel, lens_p, lens_m, train=False)
    mel2 = mel.at[:, valid_m:, :].add(50.0)
    out2 = model.apply(variables, phon, mel2, lens_p, lens_m, train=False)
    np.testing.assert_allclose(
        np.asarray(out1["pred_melspec"][:, :valid_m]),
        np.asarray(out2["pred_melspec"][:, :valid_m]),
        atol=2e-4,
    )
    np.testing.assert_allclose(
        np.asarray(out1["pred_stop"][:, :valid_m]),
        np.asarray(out2["pred_stop"][:, :valid_m]),
        atol=2e-4,
    )


def test_shared_pe_alpha(model_and_vars):
    _, variables = model_and_vars
    flat = jax.tree_util.tree_leaves_with_path(variables["params"])
    alpha_paths = [jax.tree_util.keystr(p) for p, _ in flat if "alpha" in jax.tree_util.keystr(p)]
    # exactly ONE alpha — shared between encoder and decoder (ref quirk)
    assert len(alpha_paths) == 1, alpha_paths


def test_sinusoid_table_formula():
    pe = sinusoid_table(100, 32)
    assert pe.shape == (100, 32)
    np.testing.assert_allclose(pe[0, 0::2], 0.0, atol=1e-7)
    np.testing.assert_allclose(pe[0, 1::2], 1.0, atol=1e-7)
    assert abs(pe[1, 0] - np.sin(1.0)) < 1e-6
    assert abs(pe[1, 1] - np.cos(1.0)) < 1e-6


def test_dropout_active_in_train(model_and_vars):
    model, variables = model_and_vars
    phoneme = jnp.ones((B, TP), jnp.int32)
    mel = jnp.ones((B, TM, CFG.n_mels), jnp.float32)
    lens_p, lens_m = jnp.array([TP, TP]), jnp.array([TM, TM])
    out1, _ = model.apply(
        variables, phoneme, mel, lens_p, lens_m, train=True,
        rngs={"dropout": jax.random.PRNGKey(2)}, mutable=["batch_stats"],
    )
    out2, _ = model.apply(
        variables, phoneme, mel, lens_p, lens_m, train=True,
        rngs={"dropout": jax.random.PRNGKey(3)}, mutable=["batch_stats"],
    )
    assert np.abs(np.asarray(out1["pred_melspec"] - out2["pred_melspec"])).max() > 1e-4
