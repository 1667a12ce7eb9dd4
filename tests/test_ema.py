"""EMA parameter averaging (training.ema_decay — opt-in, not in the
reference): update math, skip-guard interaction, eval routing, and
checkpoint compatibility across the three on-disk generations."""

import dataclasses
import tempfile

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from flax import core

from transformertts_tpu.config import tiny_config
from transformertts_tpu.models import TransformerTTS
from transformertts_tpu.train import (
    create_train_state,
    make_eval_step,
    make_train_step,
)
from transformertts_tpu.train.checkpoint import CheckpointManager
from transformertts_tpu.train.train_step import TrainState

from test_train_step import synthetic_batch

DECAY = 0.9


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_config()
    cfg = cfg.replace(
        training=dataclasses.replace(cfg.training, warmup_steps=15, ema_decay=DECAY)
    )
    model = TransformerTTS(cfg.model)
    batch = synthetic_batch(np.random.default_rng(0))
    state = create_train_state(model, cfg, jax.random.PRNGKey(0), batch)
    return cfg, model, batch, state


def test_ema_initialized_to_params(setup):
    _, _, _, state = setup
    assert state.ema_params is not None
    for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(state.ema_params)):
        assert np.array_equal(a, b)


def test_ema_off_by_default():
    cfg = tiny_config()
    assert cfg.training.ema_decay == 0.0
    model = TransformerTTS(cfg.model)
    batch = synthetic_batch(np.random.default_rng(0))
    state = create_train_state(model, cfg, jax.random.PRNGKey(0), batch)
    assert state.ema_params is None
    # eval_params falls back to the live params
    assert state.eval_params is state.params


def test_ema_update_math(setup):
    """After one step: ema == d*params_0 + (1-d)*params_1 exactly."""
    cfg, model, batch, state = setup
    step = make_train_step(model, cfg, scheduled_sampling=False, donate=False)
    new_state, _ = step(state, batch, 1.0, jax.random.PRNGKey(42))
    expect = jax.tree.map(
        lambda e, p: DECAY * e + (1.0 - DECAY) * p, state.params, new_state.params
    )
    for a, b in zip(jax.tree.leaves(expect), jax.tree.leaves(new_state.ema_params)):
        np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-7)


def test_ema_trails_params(setup):
    """Over steps the EMA lags the live params but moves the same way."""
    cfg, model, batch, state = setup
    step = make_train_step(model, cfg, scheduled_sampling=False, donate=False)
    for _ in range(5):
        state, _ = step(state, batch, 1.0, jax.random.PRNGKey(42))
    d_live = sum(
        float(jnp.abs(a - b).sum())
        for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(state.ema_params))
    )
    assert d_live > 0  # ema genuinely lags


def test_ema_skip_guard(setup):
    """A non-finite step must leave the EMA untouched too."""
    cfg, model, batch, state = setup
    step = make_train_step(model, cfg, scheduled_sampling=False, donate=False)
    bad = dict(batch)
    bad["melspec"] = batch["melspec"].copy()
    bad["melspec"][0, 0, :8] = np.nan
    new_state, metrics = step(state, bad, 1.0, jax.random.PRNGKey(0))
    assert float(metrics["skipped"]) == 1.0
    for a, b in zip(
        jax.tree.leaves(state.ema_params), jax.tree.leaves(new_state.ema_params)
    ):
        assert np.array_equal(a, b)


def test_eval_step_uses_ema(setup):
    """Doctored EMA (zeros) must change eval outputs vs the live params."""
    cfg, model, batch, state = setup
    ev = make_eval_step(model, cfg)
    micro = {name: arr[0] for name, arr in batch.items()}
    m_live = ev(state.replace(ema_params=state.params), micro)
    zeroed = jax.tree.map(jnp.zeros_like, state.ema_params)
    m_zero = ev(state.replace(ema_params=zeroed), micro)
    assert float(m_live["mel_l1"]) != float(m_zero["mel_l1"])


def _mini_state(ema, v=1.0):
    p = core.FrozenDict({"w": jnp.full((3,), v)})
    return TrainState(
        step=jnp.zeros((), jnp.int32), params=p,
        batch_stats=core.FrozenDict(), opt_state=(),
        ema_params=core.FrozenDict({"w": jnp.full((3,), 2.0)}) if ema else None,
    )


def _fresh_restore(d, tmpl):
    m = CheckpointManager(d)
    try:
        return m.restore(tmpl)
    finally:
        m.close()


def test_checkpoint_matrix_new_format():
    """All four (disk x template) EMA combinations for round-4+ files."""
    d1 = tempfile.mkdtemp()
    m = CheckpointManager(d1)
    m.save(1, _mini_state(False), epoch=5)
    m.close()
    r, ep = _fresh_restore(d1, _mini_state(False))
    assert r.ema_params is None and ep == 5
    r, _ = _fresh_restore(d1, _mini_state(True))
    # warm-started from the restored params, NOT the template's 2.0s
    np.testing.assert_array_equal(np.asarray(r.ema_params["w"]), np.ones(3))

    d2 = tempfile.mkdtemp()
    m = CheckpointManager(d2)
    m.save(1, _mini_state(True), epoch=7)
    m.close()
    r, ep = _fresh_restore(d2, _mini_state(True))
    np.testing.assert_array_equal(np.asarray(r.ema_params["w"]), np.full(3, 2.0))
    assert ep == 7
    # a checkpoint that carries EMA serves it even to an EMA-off caller
    r, _ = _fresh_restore(d2, _mini_state(False))
    np.testing.assert_array_equal(np.asarray(r.eval_params["w"]), np.full(3, 2.0))


def test_checkpoint_pre_ema_format():
    """Pre-round-4 checkpoints have no ema_params key at all."""
    import orbax.checkpoint as ocp
    from flax import serialization

    d = tempfile.mkdtemp()
    mgr = ocp.CheckpointManager(
        d, options=ocp.CheckpointManagerOptions(max_to_keep=3, create=True)
    )
    old_sd = serialization.to_state_dict(jax.device_get(_mini_state(False)))
    del old_sd["ema_params"]
    mgr.save(1, args=ocp.args.StandardSave(
        {"state": old_sd, "meta": {"epoch": np.asarray(9, np.int32)}}
    ))
    mgr.wait_until_finished()
    mgr.close()
    r, ep = _fresh_restore(d, _mini_state(False))
    assert r.ema_params is None and ep == 9
    r, _ = _fresh_restore(d, _mini_state(True))
    np.testing.assert_array_equal(np.asarray(r.ema_params["w"]), np.ones(3))


def test_disk_ema_kind_metadata():
    """_disk_ema_kind reads the generation straight from orbax _METADATA."""
    d1 = tempfile.mkdtemp()
    m = CheckpointManager(d1)
    m.save(1, _mini_state(False), epoch=1)
    assert m._disk_ema_kind(1) == "none"
    m.close()

    d2 = tempfile.mkdtemp()
    m = CheckpointManager(d2)
    m.save(1, _mini_state(True), epoch=1)
    assert m._disk_ema_kind(1) == "dict"
    m.close()

    assert m._disk_ema_kind(999) is None  # no such step on disk


def test_restore_adopt_ema_false_drops_disk_ema():
    """EMA-off resumed training keeps the EMA-off checkpoint layout."""
    d = tempfile.mkdtemp()
    m = CheckpointManager(d)
    m.save(1, _mini_state(True), epoch=3)
    m.close()
    m = CheckpointManager(d)
    try:
        r, ep = m.restore(_mini_state(False), adopt_ema=False)
    finally:
        m.close()
    assert r.ema_params is None and ep == 3
    np.testing.assert_array_equal(np.asarray(r.eval_params["w"]), np.ones(3))


def test_restore_warm_start_is_a_copy():
    """Warm-started ema_params must not alias params (independent buffers)."""
    d = tempfile.mkdtemp()
    m = CheckpointManager(d)
    m.save(1, _mini_state(False), epoch=1)
    m.close()
    r, _ = _fresh_restore(d, _mini_state(True))
    p = np.asarray(r.params["w"])
    e = np.asarray(r.ema_params["w"])
    np.testing.assert_array_equal(p, e)
    assert not np.shares_memory(p, e)


def test_ema_decay_validated():
    cfg = tiny_config()
    with pytest.raises(ValueError):
        cfg.replace(
            training=dataclasses.replace(cfg.training, ema_decay=1.0)
        ).validate()
