"""KV-cached decode == the reference's cacheless recompute (dropout off)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from transformertts_tpu.config import tiny_config
from transformertts_tpu.infer import make_decode_fn, naive_decode
from transformertts_tpu.models import TransformerTTS

CFG = tiny_config()
B, TP, MAX_LEN = 2, 12, 10


@pytest.fixture(scope="module")
def setup():
    model = TransformerTTS(CFG.model)
    rng = np.random.default_rng(0)
    phoneme = jnp.asarray(rng.integers(1, 60, (B, TP)), jnp.int32)
    lens = jnp.array([TP, TP - 3])
    mel = jnp.zeros((B, 32, CFG.model.n_mels))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        phoneme, mel, lens, jnp.array([32, 32]), train=False,
    )
    return model, variables, phoneme, lens


def test_cached_equals_naive(setup):
    model, variables, phoneme, lens = setup
    # threshold 2.0: sigmoid can never reach it -> both run to max_len
    decode = make_decode_fn(model, CFG, max_len=MAX_LEN, stop_threshold=2.0)
    fast = decode(variables, phoneme, lens)
    slow = naive_decode(model, variables, phoneme, lens, MAX_LEN, stop_threshold=2.0)

    assert int(fast["n_frames"]) == MAX_LEN
    np.testing.assert_allclose(
        np.asarray(fast["pred_melspec"][:, :MAX_LEN]),
        np.asarray(slow["pred_melspec"]),
        atol=2e-4,
    )
    np.testing.assert_allclose(
        np.asarray(fast["pred_stop"][:, :MAX_LEN]),
        np.asarray(slow["pred_stop"]),
        atol=2e-4,
    )
    np.testing.assert_allclose(
        np.asarray(fast["post_melspec"][:, :MAX_LEN]),
        np.asarray(slow["post_melspec"][:, :MAX_LEN]),
        atol=5e-4,
    )


def test_early_stop(setup):
    model, variables, phoneme, lens = setup
    # force a hugely positive stop bias => every row stops at the first frame
    params = jax.tree_util.tree_map(lambda x: x, variables["params"])
    flat = jax.tree_util.tree_flatten_with_path(params)
    from flax.core import unfreeze, freeze
    import flax

    p = unfreeze(params) if hasattr(params, "unfreeze") else dict(params)
    p["stop_linear"]["Dense_0"]["bias"] = jnp.array([100.0])
    variables2 = dict(variables)
    variables2["params"] = p

    decode = make_decode_fn(model, CFG, max_len=MAX_LEN, stop_threshold=0.5)
    out = decode(variables2, phoneme, lens)
    assert int(out["n_frames"]) == 1
    # frames beyond n_frames stay zero (pre-postnet)
    assert float(jnp.abs(out["pred_melspec"][:, 1:]).max()) == 0.0


def test_decode_is_jitted_once(setup):
    model, variables, phoneme, lens = setup
    decode = make_decode_fn(model, CFG, max_len=MAX_LEN, stop_threshold=2.0)
    out1 = decode(variables, phoneme, lens)
    # second call with different data: same shapes => no recompile (fast path)
    out2 = decode(variables, phoneme + 1, lens)
    assert out1["pred_melspec"].shape == out2["pred_melspec"].shape
    assert (
        np.abs(np.asarray(out1["pred_melspec"]) - np.asarray(out2["pred_melspec"])).max()
        > 1e-6
    )


def test_per_row_lengths():
    from transformertts_tpu.infer.decode import per_row_lengths
    from transformertts_tpu.models.masks import NEG_INF

    # 3 rows, global cut at 6 frames: row0 votes at frame 2, row1 never
    # votes, row2 votes at frame 0
    stops = np.full((3, 8), NEG_INF, np.float32)
    stops[:, :6] = -5.0  # decoded frames, below threshold
    stops[0, 2] = 5.0
    stops[2, 0] = 5.0
    out = per_row_lengths(jnp.asarray(stops), jnp.int32(6), 0.5)
    np.testing.assert_array_equal(np.asarray(out), [3, 6, 1])


def test_decode_reports_per_row_lengths(setup):
    model, variables, phoneme, lens = setup
    decode = make_decode_fn(model, CFG, max_len=MAX_LEN, stop_threshold=2.0)
    out = decode(variables, phoneme, lens)
    # threshold 2.0: nobody votes -> every row gets the global cut
    np.testing.assert_array_equal(
        np.asarray(out["n_frames_per_row"]), [MAX_LEN, MAX_LEN]
    )


def test_infer_prenet_dropout_runs_and_differs(setup):
    """runtime.infer_prenet_dropout > 0: decode runs on the XLA loop with
    fresh per-step masks and produces a different (stochastic) trajectory
    than the deterministic reference path; forcing the megakernel errors."""
    import dataclasses

    import pytest as _pytest

    model, variables, phoneme, lens = setup
    base = make_decode_fn(model, CFG, max_len=8, stop_threshold=2.0,
                          use_megakernel=False)(variables, phoneme, lens)
    cfg_d = CFG.replace(
        runtime=dataclasses.replace(CFG.runtime, infer_prenet_dropout=0.5))
    out = make_decode_fn(model, cfg_d, max_len=8, stop_threshold=2.0,
                         use_megakernel=False)(variables, phoneme, lens)
    assert out["pred_melspec"].shape == base["pred_melspec"].shape
    assert not np.allclose(
        np.asarray(out["pred_melspec"]), np.asarray(base["pred_melspec"]),
        atol=1e-4)
    with _pytest.raises(ValueError):
        make_decode_fn(model, cfg_d, max_len=8, use_megakernel=True)(
            variables, phoneme, lens)


def test_decode_attn_window_runs(setup):
    """runtime.decode_attn_window > 0: monotone windowed decode runs on the
    XLA loop, produces valid shapes, and the forced (batched, interpret)
    megakernel matches it — the window is supported on the kernel fast
    path since round 5 (flagship.yaml's operating point)."""
    import dataclasses

    model, variables, phoneme, lens = setup
    cfg_w = CFG.replace(
        runtime=dataclasses.replace(CFG.runtime, decode_attn_window=3))
    out = make_decode_fn(model, cfg_w, max_len=8, stop_threshold=2.0,
                         use_megakernel=False)(variables, phoneme, lens)
    assert out["pred_melspec"].shape == (B, 8, CFG.model.n_mels)
    assert np.isfinite(np.asarray(out["pred_melspec"])).all()
    mega = make_decode_fn(model, cfg_w, max_len=8, stop_threshold=2.0,
                          use_megakernel=True)(variables, phoneme, lens)
    np.testing.assert_allclose(
        np.asarray(mega["pred_melspec"]), np.asarray(out["pred_melspec"]),
        atol=5e-2)
    assert int(mega["n_frames"]) == int(out["n_frames"])


def test_decode_attn_window_megakernel_batch1(setup):
    """Batch-1 windowed megakernel (interpret) == batch-1 XLA windowed loop."""
    import dataclasses

    model, variables, phoneme, lens = setup
    cfg_w = CFG.replace(
        runtime=dataclasses.replace(CFG.runtime, decode_attn_window=2))
    ph1, l1 = phoneme[:1], lens[:1]
    ref = make_decode_fn(model, cfg_w, max_len=8, stop_threshold=2.0,
                         use_megakernel=False)(variables, ph1, l1)
    mega = make_decode_fn(model, cfg_w, max_len=8, stop_threshold=2.0,
                          use_megakernel=True)(variables, ph1, l1)
    np.testing.assert_allclose(
        np.asarray(mega["pred_melspec"]), np.asarray(ref["pred_melspec"]),
        atol=5e-2)
    assert int(mega["n_frames"]) == int(ref["n_frames"])


def _spec_cfg(k, tau, r=1):
    import dataclasses

    cfg = CFG
    if r > 1:
        cfg = cfg.replace(model=dataclasses.replace(cfg.model, reduction_factor=r))
    return cfg.replace(runtime=dataclasses.replace(
        cfg.runtime, decode_speculative_k=k, decode_speculative_tau=tau,
    ))


@pytest.mark.parametrize("r", [1, 2])
def test_speculative_tau0_equals_sequential(r):
    """tau=0 rejects every draft, so the speculative loop degenerates to
    the exact sequential decode (chunk position 0 always uses the true
    previous frame and attends only cache positions <= t)."""
    import dataclasses

    cfg = _spec_cfg(4, 0.0, r=r)
    model = TransformerTTS(cfg.model)
    rng = np.random.default_rng(7)
    phoneme = jnp.asarray(rng.integers(1, 60, (1, TP)), jnp.int32)
    lens = jnp.array([TP])
    mel = jnp.zeros((1, 8 * r, cfg.model.n_mels))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        phoneme, mel, lens, jnp.array([8 * r]), train=False,
    )
    max_len = 8 * r
    base = make_decode_fn(model, CFG if r == 1 else cfg.replace(
        runtime=dataclasses.replace(cfg.runtime, decode_speculative_k=0)
    ), max_len=max_len, stop_threshold=2.0)(variables, phoneme, lens)
    spec = make_decode_fn(model, cfg, max_len=max_len, stop_threshold=2.0)(
        variables, phoneme, lens)

    assert int(spec["n_verify_passes"]) == max_len // r  # one group per pass
    assert int(spec["n_frames"]) == int(base["n_frames"])
    np.testing.assert_allclose(
        np.asarray(spec["pred_melspec"]), np.asarray(base["pred_melspec"]),
        atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(spec["pred_stop"]), np.asarray(base["pred_stop"]),
        atol=1e-5)


def test_speculative_accepts_with_loose_tau():
    """A huge tau accepts every draft: the decode finishes in ~n_groups/K
    verify passes and still returns well-formed outputs."""
    cfg = _spec_cfg(4, 1e9)
    model = TransformerTTS(cfg.model)
    rng = np.random.default_rng(9)
    phoneme = jnp.asarray(rng.integers(1, 60, (1, TP)), jnp.int32)
    lens = jnp.array([TP])
    mel = jnp.zeros((1, 8, cfg.model.n_mels))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        phoneme, mel, lens, jnp.array([8]), train=False,
    )
    out = make_decode_fn(model, cfg, max_len=8, stop_threshold=2.0)(
        variables, phoneme, lens)
    assert int(out["n_verify_passes"]) == 2  # ceil(8 groups / K=4)
    assert int(out["n_frames"]) == 8
    assert out["pred_melspec"].shape == (1, 8, cfg.model.n_mels)
    assert np.isfinite(np.asarray(out["pred_melspec"])).all()


def test_speculative_batch_falls_through(setup):
    """B > 1 ignores the speculative flag (single-stream path only) and
    produces the standard decode output."""
    model, variables, phoneme, lens = setup
    cfg = _spec_cfg(4, 0.15)
    out = make_decode_fn(model, cfg, max_len=MAX_LEN, stop_threshold=2.0)(
        variables, phoneme, lens)
    base = make_decode_fn(model, CFG, max_len=MAX_LEN, stop_threshold=2.0)(
        variables, phoneme, lens)
    assert "n_verify_passes" not in out
    np.testing.assert_allclose(
        np.asarray(out["pred_melspec"]), np.asarray(base["pred_melspec"]),
        atol=1e-6)


def test_speculative_stop_matches_sequential():
    """Stop decisions truncate acceptance: with a reachable threshold the
    speculative decode stops at the same frame as the sequential loop
    (tau=0 path)."""
    cfg = _spec_cfg(4, 0.0)
    model = TransformerTTS(cfg.model)
    rng = np.random.default_rng(11)
    phoneme = jnp.asarray(rng.integers(1, 60, (1, TP)), jnp.int32)
    lens = jnp.array([TP])
    mel = jnp.zeros((1, 8, cfg.model.n_mels))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        phoneme, mel, lens, jnp.array([8]), train=False,
    )
    # random-init stop logits hover near 0 -> sigmoid ~0.5: 0.45 stops early
    base = make_decode_fn(model, CFG, max_len=8, stop_threshold=0.45)(
        variables, phoneme, lens)
    spec = make_decode_fn(model, cfg, max_len=8, stop_threshold=0.45)(
        variables, phoneme, lens)
    assert int(base["n_frames"]) < 8  # the test is vacuous otherwise
    assert int(spec["n_frames"]) == int(base["n_frames"])
    np.testing.assert_allclose(
        np.asarray(spec["pred_melspec"]), np.asarray(base["pred_melspec"]),
        atol=1e-5)


def test_decode_attn_window_megakernel_r2():
    """Windowed megakernel at reduction_factor=2 (the fast_serve shape):
    forced (interpret) kernel == XLA windowed loop."""
    import dataclasses

    cfg_w = CFG.replace(
        model=dataclasses.replace(CFG.model, reduction_factor=2),
        runtime=dataclasses.replace(CFG.runtime, decode_attn_window=2))
    model2 = TransformerTTS(cfg_w.model)
    rng = np.random.default_rng(3)
    phoneme = jnp.asarray(rng.integers(1, 60, (B, TP)), jnp.int32)
    lens = jnp.array([TP, TP - 3])
    variables = model2.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        phoneme, jnp.zeros((B, 32, cfg_w.model.n_mels)), lens,
        jnp.array([32, 32]), train=False,
    )
    ref = make_decode_fn(model2, cfg_w, max_len=8, stop_threshold=2.0,
                         use_megakernel=False)(variables, phoneme, lens)
    mega = make_decode_fn(model2, cfg_w, max_len=8, stop_threshold=2.0,
                          use_megakernel=True)(variables, phoneme, lens)
    np.testing.assert_allclose(
        np.asarray(mega["pred_melspec"]), np.asarray(ref["pred_melspec"]),
        atol=5e-2)
    assert int(mega["n_frames"]) == int(ref["n_frames"])
