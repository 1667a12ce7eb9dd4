"""CLI end-to-end: preprocess + train happen in the trainer fixture; here we
exercise `synthesize` against the produced checkpoint, plus utils."""

import numpy as np
import pytest

from transformertts_tpu import cli
from transformertts_tpu.utils import increment_path
from transformertts_tpu.utils.exp import PLOT_SUBDIRS

from tests.test_data import corpus  # noqa: F401
from tests.test_trainer import trained  # noqa: F401


def test_synthesize_from_checkpoint(trained, tmp_path):  # noqa: F811
    cfg, exp, _, _ = trained
    out = tmp_path / "mel.npy"
    cli.main([
        "synthesize",
        "--set", f"path.data={cfg.path.data}",
        "--set", f"path.preprocessed={cfg.path.preprocessed}",
        "--set", "model.d_model=64",
        "--set", "model.encoder_n_layers=1", "--set", "model.decoder_n_layers=1",
        "--set", "model.encoder_d_ffn=128", "--set", "model.decoder_d_ffn=128",
        "--set", "model.postnet_n_layers=2",
        "--set", "runtime.compute_dtype=float32",
        "--set", "runtime.use_pallas_attention=false",
        "--set", "runtime.phoneme_buckets=[32]",
        "--set", "runtime.infer_max_len=16",
        "--ckpt", str(exp / "run1" / "checkpoints"),
        "--text", "Hello there.",
        "--out", str(out),
    ])
    mel = np.load(out)
    assert mel.shape[0] == 80  # (n_mels, T) layout like the reference
    assert mel.shape[1] >= 1
    assert np.isfinite(mel).all()


def test_increment_path(tmp_path):
    p1 = increment_path(tmp_path)
    p2 = increment_path(tmp_path)
    assert "exp_1" in p1 and "exp_2" in p2
    for sub in PLOT_SUBDIRS:
        assert (tmp_path / p1.split("/")[-1] / sub).is_dir()


def test_preprocess_cli(corpus):  # noqa: F811
    root, out_dir, _ = corpus
    # second run must skip (out dir non-empty) without raising
    cli.main([
        "preprocess",
        "--set", f"path.data={root}",
        "--set", f"path.preprocessed={out_dir}",
    ])


def test_serve_streams_lines(trained, tmp_path):  # noqa: F811
    cfg, exp, _, _ = trained
    src = tmp_path / "lines.txt"
    src.write_text("Hello there.\n\nSecond line here.\n")  # blank line skipped
    out_dir = tmp_path / "served"
    cli.main([
        "serve",
        "--set", f"path.data={cfg.path.data}",
        "--set", f"path.preprocessed={cfg.path.preprocessed}",
        "--set", "model.d_model=64",
        "--set", "model.encoder_n_layers=1", "--set", "model.decoder_n_layers=1",
        "--set", "model.encoder_d_ffn=128", "--set", "model.decoder_d_ffn=128",
        "--set", "model.postnet_n_layers=2",
        "--set", "runtime.compute_dtype=float32",
        "--set", "runtime.use_pallas_attention=false",
        "--set", "runtime.phoneme_buckets=[32]",
        "--set", "runtime.infer_max_len=16",
        "--ckpt", str(exp / "run1" / "checkpoints"),
        "--input", str(src),
        "--out-dir", str(out_dir),
        "--chunk", "8",
    ])
    mels = sorted(out_dir.glob("utt_*.npy"))
    assert len(mels) == 2
    for p in mels:
        mel = np.load(p)
        assert mel.shape[0] == 80 and mel.shape[1] >= 1
        assert np.isfinite(mel).all()
