"""Fused in-projection (one q|k|v matmul) parity vs separate Dense path."""

import numpy as np

import jax
import jax.numpy as jnp

from transformertts_tpu.config import tiny_config
from transformertts_tpu.models import TransformerTTS

CFG = tiny_config().model
B, TP, TM = 2, 16, 64


def _data(seed):
    rng = np.random.default_rng(seed)
    phoneme = jnp.asarray(rng.integers(1, 60, (B, TP)), jnp.int32)
    mel = jnp.asarray(rng.standard_normal((B, TM, CFG.n_mels)), jnp.float32)
    return phoneme, mel, jnp.array([TP, TP - 4]), jnp.array([TM, TM - 10])


def test_fused_qkv_matches_plain():
    plain = TransformerTTS(CFG, fuse_qkv=False)
    fused = TransformerTTS(CFG, fuse_qkv=True)
    phoneme, mel, lens_p, lens_m = _data(0)

    variables = plain.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        phoneme, mel, lens_p, lens_m, train=False,
    )
    out_p = plain.apply(variables, phoneme, mel, lens_p, lens_m, train=False)
    out_f = fused.apply(variables, phoneme, mel, lens_p, lens_m, train=False)
    for key in ("pred_melspec", "post_melspec", "pred_stop", "alignments"):
        np.testing.assert_allclose(
            np.asarray(out_f[key]), np.asarray(out_p[key]), atol=1e-5, err_msg=key
        )


def test_fused_qkv_gradients_match():
    plain = TransformerTTS(CFG, fuse_qkv=False)
    fused = TransformerTTS(CFG, fuse_qkv=True)
    phoneme, mel, lens_p, lens_m = _data(1)

    variables = plain.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        phoneme, mel, lens_p, lens_m, train=False,
    )

    def loss(params, model):
        out = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            phoneme, mel, lens_p, lens_m, train=False, return_alignments=False,
        )
        return jnp.sum(out["pred_melspec"] ** 2)

    g_p = jax.grad(loss)(variables["params"], plain)
    g_f = jax.grad(loss)(variables["params"], fused)
    # fp reassociation only: dx accumulates as one (d, 3d) matmul vs three
    # (d, d) matmuls summed, so the last bits differ on a few elements
    for a, b in zip(jax.tree.leaves(g_p), jax.tree.leaves(g_f)):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=2e-3, atol=2e-3
        )
