import numpy as np
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from transformertts_tpu.train.sampling import apply_teacher_forcing, block_mask


def test_block_dilation_matches_torch_maxpool():
    """Our reduce_window dilation == torch max_pool1d(kernel=8, stride=1, pad=4)."""
    rng = np.random.default_rng(0)
    for t in (37, 64, 100):
        seed = (rng.random((3, t)) < 0.1).astype(np.float32)
        ref = F.max_pool1d(
            torch.from_numpy(seed)[:, None, :], kernel_size=8, stride=1, padding=4
        ).squeeze(1).numpy()[:, :t]
        got = jax.lax.reduce_window(
            jnp.asarray(seed), -jnp.inf, jax.lax.max,
            window_dimensions=(1, 8), window_strides=(1, 1),
            padding=((0, 0), (4, 4)),
        )[:, :t]
        np.testing.assert_array_equal(np.asarray(got), ref)


def test_block_mask_statistics():
    key = jax.random.PRNGKey(0)
    b, t = 64, 512
    # p_tf = 1.0 -> no replacement at all
    m = block_mask(key, b, t, p_tf=1.0)
    assert not bool(m.any())
    # p_tf = 0.0 -> everything replaced
    m = block_mask(key, b, t, p_tf=0.0)
    assert bool(m.all())
    # intermediate: replaced fraction well above seed rate (block dilation)
    m = block_mask(key, b, t, p_tf=0.9)
    frac = float(m.mean())
    assert 0.2 < frac < 0.8  # seeds ~10%, dilated by ~8x, with overlaps


def test_apply_teacher_forcing_mixes_and_zeroes():
    key = jax.random.PRNGKey(1)
    b, t, c = 2, 32, 4
    gt = jnp.ones((b, t, c))
    pred = jnp.full((b, t, c), 5.0)
    lens = jnp.array([t, 20])
    mixed = apply_teacher_forcing(key, pred, gt, lens, p_tf=0.5)
    vals = np.unique(np.asarray(mixed))
    assert set(vals).issubset({0.0, 1.0, 5.0})
    # beyond valid length: zero
    assert np.asarray(mixed)[1, 20:].max() == 0.0
    # p_tf=1 -> pure ground truth in valid region
    pure = apply_teacher_forcing(key, pred, gt, lens, p_tf=1.0)
    assert np.asarray(pure)[0].min() == 1.0


def test_gradients_blocked_through_predictions():
    key = jax.random.PRNGKey(2)
    gt = jnp.ones((1, 16, 2))
    lens = jnp.array([16])

    def f(pred):
        mixed = apply_teacher_forcing(key, pred, gt, lens, p_tf=0.0)
        return jnp.sum(mixed**2)

    g = jax.grad(f)(jnp.full((1, 16, 2), 3.0))
    assert float(jnp.abs(g).max()) == 0.0  # stop_gradient => no flow
