"""Loss parity vs a torch re-computation of the reference's formulas."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from transformertts_tpu.train.loss import (
    alignment_diagonality,
    guided_attention_loss,
    tts_loss,
)

B, T, C = 4, 25, 8


@pytest.fixture(scope="module")
def batch():
    g = torch.Generator().manual_seed(0)
    pred = torch.randn(B, T, C, generator=g)
    post = torch.randn(B, T, C, generator=g)
    stop = torch.randn(B, T, generator=g)
    mel = torch.randn(B, T, C, generator=g)
    lengths = torch.tensor([T, T - 5, 12, 3])
    return pred, post, stop, mel, lengths


def torch_reference_loss(pred, post, stop, mel, lengths, stop_weight=8.0):
    # re-derivation of the masked loss the reference computes (loss.py:25-49)
    seq_range = torch.arange(T)[None, :].expand(B, T)
    mask = seq_range < lengths[:, None]
    gate = seq_range == (lengths[:, None] - 1)
    pred_mel = F.mse_loss(pred[mask].view(-1, C), mel[mask].view(-1, C))
    post_mel = F.mse_loss(post[mask].view(-1, C), mel[mask].view(-1, C))
    stop_l = F.binary_cross_entropy_with_logits(
        stop[mask], gate.float()[mask], reduction="mean",
        pos_weight=torch.tensor(stop_weight),
    )
    return {
        "total": pred_mel + 0.5 * post_mel + stop_l,
        "pred_mel": pred_mel,
        "post_mel": post_mel,
        "stop": stop_l,
    }


def test_tts_loss_matches_torch(batch):
    pred, post, stop, mel, lengths = batch
    ref = torch_reference_loss(pred, post, stop, mel, lengths)
    out = tts_loss(
        {
            "pred_melspec": jnp.asarray(pred.numpy()),
            "post_melspec": jnp.asarray(post.numpy()),
            "pred_stop": jnp.asarray(stop.numpy()),
        },
        jnp.asarray(mel.numpy()),
        jnp.asarray(lengths.numpy()),
    )
    for key in ("total", "pred_mel", "post_mel", "stop"):
        assert abs(float(out[key]) - float(ref[key])) < 1e-5, key


def test_loss_ignores_padding(batch):
    pred, post, stop, mel, lengths = batch
    out1 = tts_loss(
        {
            "pred_melspec": jnp.asarray(pred.numpy()),
            "post_melspec": jnp.asarray(post.numpy()),
            "pred_stop": jnp.asarray(stop.numpy()),
        },
        jnp.asarray(mel.numpy()),
        jnp.asarray(lengths.numpy()),
    )
    # scribble on padded region of predictions
    pred2 = pred.clone()
    pred2[3, 3:] += 100.0
    stop2 = stop.clone()
    stop2[3, 3:] -= 50.0
    out2 = tts_loss(
        {
            "pred_melspec": jnp.asarray(pred2.numpy()),
            "post_melspec": jnp.asarray(post.numpy()),
            "pred_stop": jnp.asarray(stop2.numpy()),
        },
        jnp.asarray(mel.numpy()),
        jnp.asarray(lengths.numpy()),
    )
    assert abs(float(out1["total"]) - float(out2["total"])) < 1e-6


def test_gate_exactly_last_frame():
    # perfect stop logits: hugely positive at last valid frame, negative before
    lengths = jnp.array([5, 3])
    stop = jnp.full((2, 6), -20.0)
    stop = stop.at[0, 4].set(20.0).at[1, 2].set(20.0)
    zeros = jnp.zeros((2, 6, 4))
    out = tts_loss(
        {"pred_melspec": zeros, "post_melspec": zeros, "pred_stop": stop},
        zeros,
        lengths,
    )
    assert float(out["stop"]) < 1e-6


def test_stop_gate_tolerant_k():
    # stop_gate_k=3: gate target is 1 over the LAST 3 valid frames, so
    # logits positive there (and negative before) give ~zero loss, while
    # the reference's exact-frame target (k=1) penalizes the two extras.
    lengths = jnp.array([5, 3])
    stop = jnp.full((2, 6), -20.0)
    stop = stop.at[0, 2:5].set(20.0).at[1, 0:3].set(20.0)
    zeros = jnp.zeros((2, 6, 4))
    out_k3 = tts_loss(
        {"pred_melspec": zeros, "post_melspec": zeros, "pred_stop": stop},
        zeros, lengths, stop_gate_k=3,
    )
    out_k1 = tts_loss(
        {"pred_melspec": zeros, "post_melspec": zeros, "pred_stop": stop},
        zeros, lengths, stop_gate_k=1,
    )
    assert float(out_k3["stop"]) < 1e-6
    assert float(out_k1["stop"]) > 1.0  # extra positives are wrong under k=1


def test_stop_gate_k_exceeding_length():
    # k larger than a row's length: every valid frame is a positive target
    lengths = jnp.array([3])
    stop = jnp.full((1, 6), 20.0)
    zeros = jnp.zeros((1, 6, 4))
    out = tts_loss(
        {"pred_melspec": zeros, "post_melspec": zeros, "pred_stop": stop},
        zeros, lengths, stop_gate_k=5,
    )
    assert float(out["stop"]) < 1e-6


def test_guided_attention_prefers_diagonal():
    L, B2, H, TM, TP = 1, 1, 1, 20, 20
    diag = jnp.eye(TM)[None, None, None]
    anti = jnp.eye(TM)[::-1][None, None, None]
    lens_m = jnp.array([TM])
    lens_p = jnp.array([TP])
    l_diag = float(guided_attention_loss(diag, lens_m, lens_p))
    l_anti = float(guided_attention_loss(anti, lens_m, lens_p))
    assert l_diag < l_anti
    assert l_diag < 0.01


def test_diagonality_metric():
    TM = TP = 20
    diag = jnp.eye(TM)[None, None, None]
    lens = jnp.array([TM])
    d = float(alignment_diagonality(diag, lens, lens))
    assert d > 0.99
    uniform = jnp.full((1, 1, 1, TM, TP), 1.0 / TP)
    d_u = float(alignment_diagonality(uniform, lens, lens))
    assert d_u < 0.6


@pytest.mark.parametrize("seed", range(5))
def test_tts_loss_matches_torch_fuzz(seed):
    """Random shapes, lengths (incl. length-1 and full-length rows), and
    loss weights must all match the torch re-derivation."""
    rng = np.random.default_rng(seed)
    b = int(rng.integers(1, 6))
    t = int(rng.integers(2, 40))
    c = int(rng.integers(1, 12))
    stop_w = float(rng.uniform(0.5, 12.0))
    post_w = float(rng.uniform(0.1, 1.0))
    g = torch.Generator().manual_seed(seed)
    pred = torch.randn(b, t, c, generator=g)
    post = torch.randn(b, t, c, generator=g)
    stop = torch.randn(b, t, generator=g)
    mel = torch.randn(b, t, c, generator=g)
    lengths = torch.tensor(
        [int(x) for x in rng.integers(1, t + 1, size=b)], dtype=torch.long)
    lengths[0] = t  # always one full-length row

    seq_range = torch.arange(t)[None, :].expand(b, t)
    mask = seq_range < lengths[:, None]
    gate = seq_range == (lengths[:, None] - 1)
    pred_mel = F.mse_loss(pred[mask].view(-1, c), mel[mask].view(-1, c))
    post_mel = F.mse_loss(post[mask].view(-1, c), mel[mask].view(-1, c))
    stop_l = F.binary_cross_entropy_with_logits(
        stop[mask], gate.float()[mask], reduction="mean",
        pos_weight=torch.tensor(stop_w))
    ref_total = pred_mel + post_w * post_mel + stop_l

    out = tts_loss(
        {
            "pred_melspec": jnp.asarray(pred.numpy()),
            "post_melspec": jnp.asarray(post.numpy()),
            "pred_stop": jnp.asarray(stop.numpy()),
        },
        jnp.asarray(mel.numpy()),
        jnp.asarray(lengths.numpy()),
        stop_weight=stop_w,
        post_mel_weight=post_w,
    )
    assert abs(float(out["pred_mel"]) - float(pred_mel)) < 1e-5
    assert abs(float(out["post_mel"]) - float(post_mel)) < 1e-5
    assert abs(float(out["stop"]) - float(stop_l)) < 1e-5
    assert abs(float(out["total"]) - float(ref_total)) < 1e-5
