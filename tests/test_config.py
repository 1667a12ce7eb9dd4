import dataclasses

import pytest

from transformertts_tpu.config import Config, apply_overrides, load_config, tiny_config


def test_defaults_match_reference_yaml():
    cfg = Config()
    # ref config.yaml values
    assert cfg.audio.sample_rate == 22050
    assert cfg.audio.n_fft == 1024
    assert cfg.audio.hop_length == 256
    assert cfg.audio.n_mels == 80
    assert cfg.model.d_model == 256
    assert cfg.model.encoder_n_layers == 3
    assert cfg.model.decoder_n_head == 4
    assert cfg.model.encoder_d_ffn == 1024
    assert cfg.training.batch_size == 16
    assert cfg.training.grad_acc_steps == 4
    assert cfg.training.warmup_steps == 4000
    assert cfg.loss.stop_weight == 8.0


def test_load_reference_style_yaml(tmp_path):
    yaml_text = """
model:
  d_model: 128
  encoder_prenet_in_channel: 128
  encoder_prenet_out_channel: 128
training:
  batch_size: 8
"""
    p = tmp_path / "c.yaml"
    p.write_text(yaml_text)
    cfg = load_config(p)
    assert cfg.model.d_model == 128
    assert cfg.training.batch_size == 8


def test_unknown_key_rejected(tmp_path):
    p = tmp_path / "c.yaml"
    p.write_text("model:\n  nonexistent: 3\n")
    with pytest.raises(ValueError, match="unknown config key"):
        load_config(p)


def test_validation_rejects_bad_heads():
    cfg = Config()
    bad = dataclasses.replace(cfg.model, d_model=130)
    with pytest.raises(ValueError, match="not divisible"):
        dataclasses.replace(cfg, model=bad).validate()


def test_overrides():
    cfg = apply_overrides(Config(), ["training.batch_size=4", "runtime.compute_dtype=float32"])
    assert cfg.training.batch_size == 4
    assert cfg.runtime.compute_dtype == "float32"


def test_tiny_config_valid():
    cfg = tiny_config()
    assert cfg.model.encoder_n_layers == 2
    assert cfg.model.d_model == 128
