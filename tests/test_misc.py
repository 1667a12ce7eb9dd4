import json
import logging

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from transformertts_tpu.config import Config, tiny_config
from transformertts_tpu.models.masks import (
    NEG_INF,
    causal_bias,
    combine,
    key_padding_bias,
    lengths_to_valid_mask,
    padding_bias,
)
from transformertts_tpu.utils.logging import log_step_info, setup_logger


def test_masks_shapes_and_values():
    lens = jnp.array([3, 5])
    valid = lengths_to_valid_mask(lens, 6)
    assert valid.shape == (2, 6)
    assert bool(valid[0, 2]) and not bool(valid[0, 3])

    kb = key_padding_bias(lens, 6)
    assert kb.shape == (2, 6)
    assert float(kb[0, 2]) == 0.0 and float(kb[0, 3]) == NEG_INF

    pb = padding_bias(lens, 6)
    assert pb.shape == (2, 1, 1, 6)

    cb = causal_bias(4)
    assert cb.shape == (1, 1, 4, 4)
    assert float(cb[0, 0, 0, 1]) == NEG_INF and float(cb[0, 0, 1, 0]) == 0.0

    assert combine(None, None) is None
    both = combine(pb, None)
    np.testing.assert_array_equal(np.asarray(both), np.asarray(pb))


def test_config_serialization_roundtrip():
    cfg = Config().validate()
    d = json.loads(cfg.to_json())
    assert d["model"]["d_model"] == 256
    from transformertts_tpu.config import config_from_dict

    cfg2 = config_from_dict(d)
    assert cfg2 == cfg


def test_log_step_info(capsys):
    logger = setup_logger(None, name="tts_test_logger")
    log_step_info(logger, 3, 1200, {"total": 1.5, "pred_mel": 0.5}, 1e-4, 321.0)
    out = capsys.readouterr().out
    assert "epoch   3" in out and "total 1.5000" in out and "audio-s/s 321.0" in out


def test_decode_with_masked_encoder():
    """mask_encoder_source=True differs from the reference's unmasked quirk."""
    from transformertts_tpu.infer import make_decode_fn
    from transformertts_tpu.models import TransformerTTS

    cfg = tiny_config()
    model = TransformerTTS(cfg.model)
    rng = np.random.default_rng(0)
    phoneme = jnp.asarray(rng.integers(1, 60, (1, 16)), jnp.int32)
    lens = jnp.array([10])
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        phoneme, jnp.zeros((1, 32, 80)), lens, jnp.array([32]), train=False,
    )
    d_unmasked = make_decode_fn(model, cfg, max_len=6, stop_threshold=2.0)
    d_masked = make_decode_fn(model, cfg, max_len=6, stop_threshold=2.0,
                              mask_encoder_source=True)
    o1 = d_unmasked(variables, phoneme, lens)
    o2 = d_masked(variables, phoneme, lens)
    # with padding present (len 10 < 16) the two settings disagree
    assert np.abs(np.asarray(o1["pred_melspec"]) - np.asarray(o2["pred_melspec"])).max() > 1e-6
