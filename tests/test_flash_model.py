"""Full model with Pallas flash attention == XLA attention path (eval)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from transformertts_tpu.config import tiny_config
from transformertts_tpu.models import TransformerTTS

CFG = tiny_config().model
B, TP, TM = 2, 16, 64


def test_flash_model_matches_xla():
    xla_model = TransformerTTS(CFG, use_flash=False)
    flash_model = TransformerTTS(CFG, use_flash=True)

    rng = np.random.default_rng(0)
    phoneme = jnp.asarray(rng.integers(1, 60, (B, TP)), jnp.int32)
    mel = jnp.asarray(rng.standard_normal((B, TM, CFG.n_mels)), jnp.float32)
    lens_p = jnp.array([TP, TP - 4])
    lens_m = jnp.array([TM, TM - 10])

    variables = xla_model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        phoneme, mel, lens_p, lens_m, train=False,
    )
    out_x = xla_model.apply(variables, phoneme, mel, lens_p, lens_m, train=False,
                            return_alignments=False)
    out_f = flash_model.apply(variables, phoneme, mel, lens_p, lens_m, train=False,
                              return_alignments=False)
    for key in ("pred_melspec", "post_melspec", "pred_stop"):
        np.testing.assert_allclose(
            np.asarray(out_f[key]), np.asarray(out_x[key]), atol=2e-4, err_msg=key
        )


def test_flash_model_gradients_match():
    xla_model = TransformerTTS(CFG, use_flash=False)
    flash_model = TransformerTTS(CFG, use_flash=True)

    rng = np.random.default_rng(1)
    phoneme = jnp.asarray(rng.integers(1, 60, (B, TP)), jnp.int32)
    mel = jnp.asarray(rng.standard_normal((B, TM, CFG.n_mels)), jnp.float32)
    lens_p = jnp.array([TP, TP])
    lens_m = jnp.array([TM, TM])

    variables = xla_model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        phoneme, mel, lens_p, lens_m, train=False,
    )

    def loss(params, model):
        out, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            phoneme, mel, lens_p, lens_m, train=True, return_alignments=False,
            rngs={"dropout": jax.random.PRNGKey(9)}, mutable=["batch_stats"],
        )
        # dropout differs between paths (jax.random vs in-kernel PRNG), so
        # compare with dropout-free layers: tiny config has dropout>0 in
        # prenets; attention dropout is the only path difference -> compare
        # grads of the attention projections only loosely via total loss.
        return jnp.sum(out["pred_melspec"] ** 2)

    # eval-mode (deterministic) gradient comparison instead:
    def loss_det(params, model):
        out = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            phoneme, mel, lens_p, lens_m, train=False, return_alignments=False,
        )
        return jnp.sum(out["pred_melspec"] ** 2)

    g_x = jax.grad(loss_det)(variables["params"], xla_model)
    g_f = jax.grad(loss_det)(variables["params"], flash_model)
    flat_x = jax.tree.leaves(g_x)
    flat_f = jax.tree.leaves(g_f)
    for a, b in zip(flat_x, flat_f):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=5e-3)
