"""Mesh/sharding tests on the 8-virtual-device CPU backend (SURVEY.md §4)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from transformertts_tpu.config import tiny_config
from transformertts_tpu.models import TransformerTTS
from transformertts_tpu.parallel import make_mesh, param_spec, shard_batch, shard_state
from transformertts_tpu.train import create_train_state, make_train_step

from tests.test_train_step import synthetic_batch


def test_eight_virtual_devices():
    assert len(jax.devices()) == 8


def test_param_spec_rules():
    assert param_spec("decoder/layer_0/self_attn/q_proj/kernel", tp=True) == P(None, "model")
    assert param_spec("decoder/layer_0/self_attn/out_proj/kernel", tp=True) == P("model", None)
    assert param_spec("encoder/layer_1/ffn/Dense_0/kernel", tp=True) == P(None, "model")
    assert param_spec("encoder/layer_1/ffn/Dense_1/kernel", tp=True) == P("model", None)
    assert param_spec("emb/embedding", tp=True) == P(None, None)
    assert param_spec("norm1/scale", tp=True) == P()
    assert param_spec("anything", tp=False) == P()


@pytest.mark.parametrize("n_data,n_model", [(8, 1), (4, 2)])
def test_dp_tp_train_step(n_data, n_model):
    cfg = tiny_config()
    model = TransformerTTS(cfg.model)
    mesh = make_mesh(n_data, n_model)

    rng = np.random.default_rng(0)
    batch = synthetic_batch(rng, k=2, b=8)  # B=8 divisible by data axis
    state = create_train_state(model, cfg, jax.random.PRNGKey(0), batch)
    state = shard_state(state, mesh)
    sharded = shard_batch(batch, mesh)

    step = make_train_step(model, cfg, scheduled_sampling=True, donate=False)
    with mesh:
        new_state, metrics = step(state, sharded, 0.8, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["total"]))
    assert int(new_state.step) == 1

    if n_model > 1:
        # verify a TP param is actually sharded over 'model'
        p = new_state.params["encoder"]["layer_0"]["ffn"]["Dense_0"]["kernel"]
        assert len(p.sharding.device_set) == 8
        spec = p.sharding.spec
        assert "model" in str(spec)


def test_dp_matches_single_device():
    """DP-sharded step == replicated step (same batch, same rng)."""
    cfg = tiny_config()
    model = TransformerTTS(cfg.model)
    rng = np.random.default_rng(1)
    batch = synthetic_batch(rng, k=1, b=8)
    state0 = create_train_state(model, cfg, jax.random.PRNGKey(0), batch)

    step = make_train_step(model, cfg, scheduled_sampling=False, donate=False)
    _, m_single = step(state0, batch, 1.0, jax.random.PRNGKey(1))

    mesh = make_mesh(8, 1)
    state_sh = shard_state(
        create_train_state(model, cfg, jax.random.PRNGKey(0), batch), mesh
    )
    with mesh:
        _, m_dp = step(state_sh, shard_batch(batch, mesh), 1.0, jax.random.PRNGKey(1))
    assert abs(float(m_single["total"]) - float(m_dp["total"])) < 1e-4


def test_tp_decode(corpus=None):
    """KV-cached decode runs with TP-sharded params on a (4,2) mesh and
    matches the replicated result."""
    cfg = tiny_config()
    import dataclasses
    cfg = cfg.replace(runtime=dataclasses.replace(cfg.runtime, infer_max_len=8))
    model = TransformerTTS(cfg.model)
    rng = np.random.default_rng(0)
    phoneme = jnp.asarray(rng.integers(1, 60, (2, 16)), jnp.int32)
    lens = jnp.array([16, 12])
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        phoneme, jnp.zeros((2, 32, cfg.model.n_mels)), lens, jnp.array([32, 32]),
        train=False,
    )
    from transformertts_tpu.infer import make_decode_fn
    from transformertts_tpu.parallel.mesh import state_shardings
    decode = make_decode_fn(model, cfg, max_len=8, stop_threshold=2.0)
    ref = decode(variables, phoneme, lens)

    mesh = make_mesh(4, 2)
    sharded_vars = jax.device_put(variables, state_shardings(variables, mesh))
    with mesh:
        out = decode(sharded_vars, phoneme, lens)
    np.testing.assert_allclose(
        np.asarray(out["pred_melspec"]), np.asarray(ref["pred_melspec"]), atol=1e-4
    )


@pytest.mark.parametrize("n_data,n_model", [(2, 4), (1, 8)])
def test_sequence_parallel_train_step(n_data, n_model):
    """Sequence parallelism (runtime.shard_sequence, SURVEY §5.7): mel and
    phoneme TIME axes sharded over the 'model' axis run the full train
    step and match the replicated numerics."""
    cfg = tiny_config()
    model = TransformerTTS(cfg.model)
    rng = np.random.default_rng(2)
    batch = synthetic_batch(rng, k=1, b=8)
    assert batch["melspec"].shape[2] % n_model == 0  # even T shards

    step = make_train_step(model, cfg, scheduled_sampling=False, donate=False)
    state0 = create_train_state(model, cfg, jax.random.PRNGKey(0), batch)
    _, m_ref = step(state0, batch, 1.0, jax.random.PRNGKey(1))

    mesh = make_mesh(n_data, n_model)
    state_sh = shard_state(
        create_train_state(model, cfg, jax.random.PRNGKey(0), batch), mesh
    )
    with mesh:
        sharded = shard_batch(batch, mesh, shard_sequence=True)
        # time axes actually sharded over 'model'
        assert "model" in str(sharded["melspec"].sharding.spec)
        _, m_sp = step(state_sh, sharded, 1.0, jax.random.PRNGKey(1))
    assert abs(float(m_ref["total"]) - float(m_sp["total"])) < 1e-4
