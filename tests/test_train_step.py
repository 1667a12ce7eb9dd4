"""Smoke test: tiny config trains on synthetic data, loss decreases.

(SURVEY.md §4: integration test = tiny config on CPU to loss-decrease;
BASELINE.json config 1.)
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from transformertts_tpu.config import tiny_config
from transformertts_tpu.models import TransformerTTS
from transformertts_tpu.train import (
    create_train_state,
    make_eval_step,
    make_train_step,
)
from transformertts_tpu.train.train_step import count_params

K, B, TP, TM, C = 2, 4, 16, 64, 80


def synthetic_batch(rng, k=K, b=B):
    """Deterministic phoneme->mel mapping so the model can actually learn."""
    phoneme = rng.integers(1, 60, (k, b, TP)).astype(np.int32)
    # target mel = smooth function of a repeated phoneme pattern
    t_idx = np.arange(TM)[None, None, :, None] / TM
    phon_val = phoneme[..., None, :TP].mean(-1)[..., None, None]
    mel_idx = np.arange(C)[None, None, None, :] / C
    melspec = np.sin(phon_val * 0.3 + 6 * t_idx + 3 * mel_idx).astype(np.float32)
    return {
        "phoneme": phoneme,
        "melspec": melspec.reshape(k, b, TM, C).astype(np.float32),
        "phoneme_lens": np.full((k, b), TP, np.int32),
        "melspec_lens": np.full((k, b), TM, np.int32),
    }


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_config()
    # short Noam warmup so the LR is non-negligible within a few steps
    cfg = cfg.replace(training=dataclasses.replace(cfg.training, warmup_steps=15))
    model = TransformerTTS(cfg.model)
    rng = np.random.default_rng(0)
    batch = synthetic_batch(rng)
    state = create_train_state(model, cfg, jax.random.PRNGKey(0), batch)
    return cfg, model, batch, state


def test_param_count_reasonable(setup):
    _, _, _, state = setup
    n = count_params(state.params)
    assert 1_000_000 < n < 20_000_000


def test_loss_decreases(setup):
    cfg, model, batch, state = setup
    step = make_train_step(model, cfg, scheduled_sampling=False, donate=False)
    rng = jax.random.PRNGKey(42)
    first = None
    n_steps = 30
    for i in range(n_steps):
        state, metrics = step(state, batch, 1.0, rng)
        if i == 0:
            first = float(metrics["total"])
    last = float(metrics["total"])
    assert np.isfinite(last)
    assert last < first * 0.8, (first, last)
    assert int(state.step) == n_steps


def test_scheduled_sampling_step_runs(setup):
    cfg, model, batch, state = setup
    step = make_train_step(model, cfg, scheduled_sampling=True, donate=False)
    state2, metrics = step(state, batch, 0.7, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["total"]))
    # batch stats must have been updated by BOTH forwards
    diff = jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).max()), state.batch_stats, state2.batch_stats
    )
    assert max(jax.tree.leaves(diff)) > 0


def test_eval_step(setup):
    cfg, model, batch, state = setup
    ev = make_eval_step(model, cfg)
    micro = {name: arr[0] for name, arr in batch.items()}
    metrics = ev(state, micro)
    for key in ("total", "pred_mel", "post_mel", "stop", "diagonality", "mel_l1"):
        assert np.isfinite(float(metrics[key])), key
    assert 0.0 <= float(metrics["diagonality"]) <= 1.0


def test_guided_attention_in_train(setup):
    cfg, model, batch, state = setup
    cfg2 = cfg.replace(loss=dataclasses.replace(cfg.loss, guided_attn_weight=1.0))
    step = make_train_step(model, cfg2, scheduled_sampling=False, donate=False)
    _, metrics = step(state, batch, 1.0, jax.random.PRNGKey(2))
    assert "guided_attn" in metrics
    assert float(metrics["guided_attn"]) > 0


def test_ga_weight_traced_override(setup):
    # the trainer's annealing path passes a per-epoch traced scalar that
    # overrides cfg.loss.guided_attn_weight without retracing per value
    cfg, model, batch, state = setup
    cfg2 = cfg.replace(loss=dataclasses.replace(cfg.loss, guided_attn_weight=1.0))
    step = make_train_step(model, cfg2, scheduled_sampling=False, donate=False)
    _, m0 = step(state, batch, 1.0, jax.random.PRNGKey(2), 0.0)
    _, m2 = step(state, batch, 1.0, jax.random.PRNGKey(2), 2.0)
    ga = float(m0["guided_attn"])
    assert abs(float(m2["guided_attn"]) - ga) < 1e-6  # raw term unchanged
    assert abs(float(m2["total"]) - float(m0["total"]) - 2.0 * ga) < 1e-4


def test_nonfinite_step_skipped(setup):
    """Failure guard: a NaN batch must not touch params (SURVEY §5.3)."""
    cfg, model, batch, state = setup
    step = make_train_step(model, cfg, scheduled_sampling=False, donate=False)
    bad = dict(batch)
    bad["melspec"] = batch["melspec"].copy()
    bad["melspec"][0, 0, :8] = np.nan
    new_state, metrics = step(state, bad, 1.0, jax.random.PRNGKey(0))
    assert float(metrics["skipped"]) == 1.0
    before = jax.tree.leaves(state.params)
    after = jax.tree.leaves(new_state.params)
    assert all(np.array_equal(a, b) for a, b in zip(before, after))
    assert int(new_state.step) == int(state.step) + 1  # step still counts

    good_state, m2 = step(state, batch, 1.0, jax.random.PRNGKey(0))
    assert float(m2["skipped"]) == 0.0
    changed = any(
        not np.array_equal(a, b)
        for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(good_state.params))
    )
    assert changed


def test_fused_optimizer_equivalent(setup):
    """optax.flatten'd chain == per-leaf chain modulo reduction order.

    (The global-norm clip sums squares in a different association, so the
    trajectories agree to float tolerance, not bitwise.)"""
    cfg, model, batch, _ = setup

    def run(fused):
        c = cfg.replace(runtime=dataclasses.replace(cfg.runtime, fused_optimizer=fused))
        state = create_train_state(model, c, jax.random.PRNGKey(0), batch)
        step = make_train_step(model, c, scheduled_sampling=False, donate=False)
        for _ in range(3):
            state, _ = step(state, batch, 1.0, jax.random.PRNGKey(7))
        return state.params

    p_flat = run(True)
    p_tree = run(False)
    for a, b in zip(jax.tree.leaves(p_tree), jax.tree.leaves(p_flat)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=5e-4)


def test_unroll_matches_rolled(setup, monkeypatch):
    """TTS_ACCUM_UNROLL must not change the math — only the HLO shape."""
    cfg, model, batch, state = setup
    key = jax.random.PRNGKey(3)
    step = make_train_step(model, cfg, scheduled_sampling=True, donate=False)
    _, m_rolled = step(state, batch, 0.8, key)
    monkeypatch.setenv("TTS_ACCUM_UNROLL", "2")
    step_u = make_train_step(model, cfg, scheduled_sampling=True, donate=False)
    _, m_unrolled = step_u(state, batch, 0.8, key)
    np.testing.assert_allclose(
        float(m_rolled["total"]), float(m_unrolled["total"]), rtol=1e-5)
