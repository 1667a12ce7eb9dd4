"""Numerical parity vs torch's stock Transformer layers.

The reference model is built from torch ``nn.TransformerEncoder`` and a
decoder whose only change is weight capture (SURVEY.md §2.1 #16-17). These
tests load the SAME weights into both implementations and require allclose
outputs — validating post-LN ordering, masking, FFN, and MHA semantics.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from transformertts_tpu.models.attention import MultiHeadAttention
from transformertts_tpu.models.masks import key_padding_bias, padding_bias
from transformertts_tpu.models.transformer import DecoderLayer, EncoderLayer

D, H, FFN = 64, 4, 128
B, T, S = 3, 17, 11


def _t2j(t):
    return jnp.asarray(t.detach().numpy())


def mha_params(tmha):
    w = tmha.in_proj_weight.detach().numpy()
    b = tmha.in_proj_bias.detach().numpy()
    wq, wk, wv = w[:D], w[D : 2 * D], w[2 * D :]
    bq, bk, bv = b[:D], b[D : 2 * D], b[2 * D :]
    return {
        "q_proj": {"kernel": jnp.asarray(wq.T), "bias": jnp.asarray(bq)},
        "k_proj": {"kernel": jnp.asarray(wk.T), "bias": jnp.asarray(bk)},
        "v_proj": {"kernel": jnp.asarray(wv.T), "bias": jnp.asarray(bv)},
        "out_proj": {
            "kernel": _t2j(tmha.out_proj.weight).T,
            "bias": _t2j(tmha.out_proj.bias),
        },
    }


def linear_params(tlin):
    return {"kernel": _t2j(tlin.weight).T, "bias": _t2j(tlin.bias)}


def norm_params(tnorm):
    return {"scale": _t2j(tnorm.weight), "bias": _t2j(tnorm.bias)}


@pytest.fixture(scope="module")
def data():
    torch.manual_seed(0)
    x = torch.randn(B, T, D)
    mem = torch.randn(B, S, D)
    tgt_lens = torch.tensor([T, T - 3, 5])
    src_lens = torch.tensor([S, S - 2, 7])
    return x, mem, tgt_lens, src_lens


def test_mha_matches_torch(data):
    x, mem, _, src_lens = data
    tmha = torch.nn.MultiheadAttention(D, H, batch_first=True)
    tmha.eval()
    key_pad = torch.arange(S)[None, :] >= src_lens[:, None]
    with torch.no_grad():
        ref, ref_w = tmha(x, mem, mem, key_padding_mask=key_pad, need_weights=True,
                          average_attn_weights=False)

    mod = MultiHeadAttention(D, H, dropout=0.0)
    params = {"params": mha_params(tmha)}
    bias = padding_bias(jnp.asarray(src_lens.numpy()), S)
    out, w = mod.apply(params, _t2j(x), _t2j(mem), bias, False, True)
    np.testing.assert_allclose(np.asarray(out), ref.numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(w), ref_w.numpy(), atol=2e-5)


def test_encoder_layer_matches_torch(data):
    x, _, _, _ = data
    tl = torch.nn.TransformerEncoderLayer(D, H, FFN, dropout=0.0, activation="relu",
                                          batch_first=True)
    tl.eval()
    lens = torch.tensor([T, T - 4, 9])
    key_pad = torch.arange(T)[None, :] >= lens[:, None]
    with torch.no_grad():
        ref = tl(x, src_key_padding_mask=key_pad)

    params = {
        "params": {
            "self_attn": mha_params(tl.self_attn),
            "ffn": {"Dense_0": linear_params(tl.linear1), "Dense_1": linear_params(tl.linear2)},
            "norm1": norm_params(tl.norm1),
            "norm2": norm_params(tl.norm2),
        }
    }
    mod = EncoderLayer(D, H, FFN, dropout=0.0)
    kb = key_padding_bias(jnp.asarray(lens.numpy()), T)
    out = mod.apply(params, _t2j(x), kb, False)
    # padded query rows differ (torch may emit NaN there); compare valid rows
    for i, L in enumerate(lens.tolist()):
        np.testing.assert_allclose(
            np.asarray(out)[i, :L], ref.numpy()[i, :L], atol=3e-5
        )


def test_decoder_layer_matches_torch(data):
    x, mem, tgt_lens, src_lens = data
    tl = torch.nn.TransformerDecoderLayer(D, H, FFN, dropout=0.0, activation="relu",
                                          batch_first=True)
    tl.eval()
    tgt_pad = torch.arange(T)[None, :] >= tgt_lens[:, None]
    mem_pad = torch.arange(S)[None, :] >= src_lens[:, None]
    tgt_mask = torch.triu(torch.ones(T, T), diagonal=1).bool()
    with torch.no_grad():
        ref = tl(x, mem, tgt_mask=tgt_mask, tgt_key_padding_mask=tgt_pad,
                 memory_key_padding_mask=mem_pad)

    params = {
        "params": {
            "self_attn": mha_params(tl.self_attn),
            "cross_attn": mha_params(tl.multihead_attn),
            "ffn": {"Dense_0": linear_params(tl.linear1), "Dense_1": linear_params(tl.linear2)},
            "norm1": norm_params(tl.norm1),
            "norm2": norm_params(tl.norm2),
            "norm3": norm_params(tl.norm3),
        }
    }
    mod = DecoderLayer(D, H, FFN, dropout=0.0)
    tgt_kb = key_padding_bias(jnp.asarray(tgt_lens.numpy()), T)
    mem_kb = key_padding_bias(jnp.asarray(src_lens.numpy()), S)
    out, align = mod.apply(
        params, _t2j(x), _t2j(mem), tgt_kb, mem_kb, False, True
    )
    assert align.shape == (B, H, T, S)
    for i, L in enumerate(tgt_lens.tolist()):
        np.testing.assert_allclose(
            np.asarray(out)[i, :L], ref.numpy()[i, :L], atol=3e-5
        )
    # alignment rows are a distribution over valid source positions
    row_sums = np.asarray(align).sum(-1)
    np.testing.assert_allclose(row_sums[0], 1.0, atol=1e-5)
    assert np.asarray(align)[1, :, :, S - 2 :].max() < 1e-6  # padded keys masked
