"""Fused FFN Pallas kernel parity vs XLA (interpret mode)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from transformertts_tpu.config import tiny_config
from transformertts_tpu.models import TransformerTTS
from transformertts_tpu.ops.pallas.fused_ffn import fused_ffn


def _params(rng, d, f):
    w1 = jnp.asarray(rng.standard_normal((d, f)) * 0.05, jnp.float32)
    b1 = jnp.asarray(rng.standard_normal(f) * 0.05, jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((f, d)) * 0.05, jnp.float32)
    b2 = jnp.asarray(rng.standard_normal(d) * 0.05, jnp.float32)
    return w1, b1, w2, b2


def ref_ffn(x, w1, b1, w2, b2):
    h = jnp.maximum(x @ w1 + b1, 0.0)
    return h @ w2 + b2


@pytest.mark.parametrize("shape,f", [((2, 32, 256), 1024), ((48, 128), 512), ((3, 8, 64), 96)])
def test_forward_parity(shape, f):
    rng = np.random.default_rng(0)
    d = shape[-1]
    x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    w1, b1, w2, b2 = _params(rng, d, f)

    out = fused_ffn(x, w1, b1, w2, b2, interpret=True)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref_ffn(x, w1, b1, w2, b2)), atol=1e-4
    )


def test_gradient_parity():
    rng = np.random.default_rng(1)
    shape, d, f = (4, 16, 128), 128, 256
    x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    w1, b1, w2, b2 = _params(rng, d, f)
    cot = jnp.asarray(rng.standard_normal(shape), jnp.float32)

    def loss_ref(x, w1, b1, w2, b2):
        return jnp.sum(ref_ffn(x, w1, b1, w2, b2) * cot)

    def loss_fused(x, w1, b1, w2, b2):
        return jnp.sum(fused_ffn(x, w1, b1, w2, b2, interpret=True) * cot)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(x, w1, b1, w2, b2)
    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(x, w1, b1, w2, b2)
    for a, b, name in zip(g_ref, g_fused, ("dx", "dw1", "db1", "dw2", "db2")):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=2e-4, err_msg=name
        )


# --- full model: fused FFN path == plain path (dropout off) ---

CFG = tiny_config().model
B, TP, TM = 2, 16, 64


def _data(seed):
    rng = np.random.default_rng(seed)
    phoneme = jnp.asarray(rng.integers(1, 60, (B, TP)), jnp.int32)
    mel = jnp.asarray(rng.standard_normal((B, TM, CFG.n_mels)), jnp.float32)
    return phoneme, mel, jnp.array([TP, TP - 4]), jnp.array([TM, TM - 10])


def test_fused_ffn_model_matches_plain():
    plain = TransformerTTS(CFG, use_fused_ffn=False)
    fused = TransformerTTS(CFG, use_fused_ffn=True)
    phoneme, mel, lens_p, lens_m = _data(0)

    variables = plain.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        phoneme, mel, lens_p, lens_m, train=False,
    )
    out_p = plain.apply(variables, phoneme, mel, lens_p, lens_m, train=False,
                        return_alignments=False)
    out_f = fused.apply(variables, phoneme, mel, lens_p, lens_m, train=False,
                        return_alignments=False)
    for key in ("pred_melspec", "post_melspec", "pred_stop"):
        np.testing.assert_allclose(
            np.asarray(out_f[key]), np.asarray(out_p[key]), atol=2e-4, err_msg=key
        )


def test_fused_ffn_model_gradients_match():
    plain = TransformerTTS(CFG, use_fused_ffn=False)
    fused = TransformerTTS(CFG, use_fused_ffn=True)
    phoneme, mel, lens_p, lens_m = _data(1)

    variables = plain.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        phoneme, mel, lens_p, lens_m, train=False,
    )

    def loss_det(params, model):
        out = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            phoneme, mel, lens_p, lens_m, train=False, return_alignments=False,
        )
        return jnp.sum(out["pred_melspec"] ** 2)

    g_p = jax.grad(loss_det)(variables["params"], plain)
    g_f = jax.grad(loss_det)(variables["params"], fused)
    for a, b in zip(jax.tree.leaves(g_p), jax.tree.leaves(g_f)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=5e-3)
