from pathlib import Path

import pytest

from transformertts_tpu.config import load_config

CONFIG_DIR = Path(__file__).resolve().parent.parent / "configs"


@pytest.mark.parametrize("name", ["ljspeech.yaml", "paper.yaml", "large_tp.yaml"])
def test_shipped_configs_load(name):
    cfg = load_config(CONFIG_DIR / name)
    assert cfg.model.d_model in (256, 512, 1024)
    assert cfg.audio.n_mels == 80


def test_large_tp_settings():
    cfg = load_config(CONFIG_DIR / "large_tp.yaml")
    assert cfg.runtime.mesh_model == 2
    assert cfg.loss.guided_attn_weight > 0
    assert cfg.model.d_model % cfg.model.encoder_n_head == 0
