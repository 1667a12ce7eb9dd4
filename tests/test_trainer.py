"""End-to-end integration: preprocess -> Trainer.fit -> checkpoints/plots/resume."""

import json

import numpy as np
import pytest

from transformertts_tpu.config import load_config
from transformertts_tpu.train.checkpoint import CheckpointManager
from transformertts_tpu.train.trainer import Trainer

from tests.test_data import corpus  # noqa: F401  (fixture)


@pytest.fixture(scope="module")
def trained(corpus, tmp_path_factory):  # noqa: F811
    root, out, _ = corpus
    exp = tmp_path_factory.mktemp("exp")
    cfg = load_config(None, [
        f"path.data={root}", f"path.preprocessed={out}", f"path.experiment={exp}",
        "model.d_model=64", "model.encoder_n_layers=1", "model.decoder_n_layers=1",
        "model.encoder_d_ffn=128", "model.decoder_d_ffn=128",
        "model.postnet_n_layers=2",
        "training.batch_size=2", "training.grad_acc_steps=2",
        "training.num_epochs=2", "training.log_interval=1",
        "training.teacher_forcing_warmup_epochs=0",
        "runtime.compute_dtype=float32",
        # CPU test: XLA attention (flash would run in slow interpret mode)
        "runtime.use_pallas_attention=false", "runtime.prng_impl=threefry2x32",
        "runtime.phoneme_buckets=[32]", "runtime.mel_buckets=[64,128]",
        "runtime.infer_max_len=16",
    ])
    trainer = Trainer(cfg, exp / "run1", resume=False)
    result = trainer.fit()
    return cfg, exp, trainer, result


def test_fit_completes(trained):
    _, _, _, result = trained
    assert result["epochs"] == 2
    assert np.isfinite(result["best_val"])


def test_history_written(trained):
    _, exp, _, _ = trained
    hist = json.loads((exp / "run1" / "history.json").read_text())
    assert len(hist) == 2
    assert {"epoch", "total", "val_loss", "audio_s_per_s", "p_tf",
            "val_free_mel_l1", "val_free_mcd", "val_free_len_ratio"} <= set(hist[0])
    assert hist[1]["p_tf"] < 1.0  # linear decay kicks in after epoch 0
    assert hist[0]["audio_s_per_s"] > 0


def test_plots_written(trained):
    _, exp, _, _ = trained
    for sub in ("mels_batch", "align_batch", "align_single", "mels_single"):
        files = list((exp / "run1" / sub).glob("*.png"))
        assert files, sub


def test_scheduled_sampling_plots_written_at_train_time(trained):
    """The reference dumps plot_mels_scheduled from the ACTUAL training batch
    every log_interval (ref: lightning_module.py:82); epoch 1 runs with
    p_tf < 1 and log_interval=1, so train-time dumps must exist."""
    _, exp, _, _ = trained
    files = list((exp / "run1" / "mels_scheduled").glob("epoch_0001_step_*.png"))
    assert files


def test_checkpoint_and_resume(trained):
    cfg, exp, trainer, _ = trained
    mgr = CheckpointManager(exp / "run1" / "checkpoints")
    assert mgr.latest_step() is not None

    # resuming constructs a trainer that starts at epoch 2 (== num_epochs: done)
    trainer2 = Trainer(cfg, exp / "run1", resume=True)
    assert trainer2.start_epoch == 2
    r = trainer2.fit()
    assert r["epochs"] == 0  # nothing left to do


def test_restored_state_matches(trained):
    cfg, exp, trainer, _ = trained
    import jax

    mgr = CheckpointManager(exp / "run1" / "checkpoints")
    restored, epoch = mgr.restore(jax.device_get(trainer.state))
    assert epoch == 2
    a = jax.device_get(trainer.state.params)
    b = restored.params
    leaves_a, leaves_b = jax.tree.leaves(a), jax.tree.leaves(b)
    assert all(np.allclose(x, y) for x, y in zip(leaves_a, leaves_b))


def test_guided_weight_anneal_schedule():
    # pure-logic test of the diagonality-triggered anneal (no fit needed)
    import dataclasses
    from types import SimpleNamespace

    from transformertts_tpu.config import Config

    cfg = Config().replace(loss=dataclasses.replace(
        Config().loss, guided_attn_weight=10.0,
        guided_attn_anneal_at_diag=0.9, guided_attn_anneal_epochs=20,
    ))
    stub = SimpleNamespace(cfg=cfg, ga_anneal_start=None)
    # before the trigger: full weight
    assert Trainer._guided_weight(stub, 5) == 10.0
    # after the trigger at epoch 30: linear decay over 20 epochs
    stub.ga_anneal_start = 30
    assert Trainer._guided_weight(stub, 30) == 10.0
    assert abs(Trainer._guided_weight(stub, 40) - 5.0) < 1e-9
    assert Trainer._guided_weight(stub, 50) == 0.0
    assert Trainer._guided_weight(stub, 200) == 0.0
    # annealing disabled -> None (static cfg weight path)
    cfg_off = Config().replace(loss=dataclasses.replace(
        Config().loss, guided_attn_weight=10.0,
    ))
    stub_off = SimpleNamespace(cfg=cfg_off, ga_anneal_start=None)
    assert Trainer._guided_weight(stub_off, 5) is None


def test_anneal_start_recovery_from_history():
    """Resume recovery of the anneal trigger (round-4 review fix): the
    explicit ga_anneal_start record works even for the window right after
    the trigger where ga_w still equals the base weight; legacy histories
    without it fall back to inverting the decay."""
    import dataclasses

    from transformertts_tpu.config import Config

    loss_cfg = dataclasses.replace(
        Config().loss, guided_attn_weight=10.0,
        guided_attn_anneal_at_diag=0.9, guided_attn_anneal_epochs=20,
    )
    # trigger fired at epoch 34 -> start 35; crash right after epoch 35's
    # checkpoint: both rows still carry ga_w == base (decay frac 0)
    hist = [
        {"epoch": 33, "ga_w": 10.0, "ga_anneal_start": None},
        {"epoch": 34, "ga_w": 10.0, "ga_anneal_start": 35},
        {"epoch": 35, "ga_w": 10.0, "ga_anneal_start": 35},
    ]
    assert Trainer._recover_anneal_start(hist, loss_cfg) == 35
    # legacy history (no explicit record): invert the linear decay
    legacy = [
        {"epoch": 34, "ga_w": 10.0},
        {"epoch": 36, "ga_w": 9.0},  # frac 0.1 -> start = 36 - 2 = 34
    ]
    assert Trainer._recover_anneal_start(legacy, loss_cfg) == 34
    # no anneal ever triggered
    assert Trainer._recover_anneal_start(
        [{"epoch": 1, "ga_w": 10.0, "ga_anneal_start": None}], loss_cfg
    ) is None
    assert Trainer._recover_anneal_start([{"epoch": 1}], loss_cfg) is None


def test_best_checkpoint_retained(trained):
    """training.keep_best_metric (default val_free_mcd_dtw): the single best
    checkpoint survives under checkpoints_best/ even as the rolling latest-3
    retention advances past it (motivated by the stacked-flagship 200-epoch
    regression: the best free-running model was deleted by rolling-only
    retention)."""
    cfg, exp, _, result = trained
    hist = json.loads((exp / "run1" / "history.json").read_text())
    metric = cfg.training.keep_best_metric
    assert metric == "val_free_mcd_dtw"
    best_row = min((h for h in hist if metric in h), key=lambda h: h[metric])
    mgr = CheckpointManager(exp / "run1" / "checkpoints_best")
    assert mgr.latest_step() is not None
    # fit() reports the retained best value, matching the history minimum
    assert result["best_" + metric] == best_row[metric]
