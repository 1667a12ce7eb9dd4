"""Decode-step megakernel == XLA cached-decode oracle (interpret mode)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from transformertts_tpu.config import tiny_config
from transformertts_tpu.infer.decode import make_decode_fn
from transformertts_tpu.models import TransformerTTS


def _setup(r=1, dtype=jnp.float32):
    cfg = tiny_config()
    if r > 1:
        import dataclasses

        cfg = cfg.replace(model=dataclasses.replace(cfg.model, reduction_factor=r))
    model = TransformerTTS(cfg.model, dtype=dtype)
    rng = np.random.default_rng(0)
    b, tp = 1, 16
    phoneme = jnp.asarray(rng.integers(1, 60, (b, tp)), jnp.int32)
    lens = jnp.full((b,), tp, jnp.int32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        phoneme, jnp.zeros((b, 8 * r, cfg.model.n_mels), jnp.float32),
        lens, jnp.full((b,), 8 * r, jnp.int32), train=False,
    )
    return cfg, model, variables, phoneme, lens


@pytest.mark.parametrize("r", [1, 2])
def test_megakernel_matches_xla_decode(r):
    cfg, model, variables, phoneme, lens = _setup(r)
    max_len = 16 * r
    # force decode to run to max_len so every step is compared
    ref_fn = make_decode_fn(model, cfg, max_len=max_len, stop_threshold=2.0,
                            use_megakernel=False)
    mega_fn = make_decode_fn(model, cfg, max_len=max_len, stop_threshold=2.0,
                             use_megakernel=True)
    ref = ref_fn(variables, phoneme, lens)
    out = mega_fn(variables, phoneme, lens)
    assert int(out["n_frames"]) == int(ref["n_frames"]) == max_len
    np.testing.assert_allclose(
        np.asarray(out["pred_melspec"]), np.asarray(ref["pred_melspec"]),
        atol=2e-4, rtol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(out["pred_stop"]), np.asarray(ref["pred_stop"]),
        atol=2e-4, rtol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(out["post_melspec"]), np.asarray(ref["post_melspec"]),
        atol=5e-4, rtol=1e-4,
    )


def test_megakernel_early_stop():
    """Stop voting must behave identically through the megakernel path."""
    cfg, model, variables, phoneme, lens = _setup()
    # threshold 0.0 => sigmoid >= 0 always true => stops after first step
    fn = make_decode_fn(model, cfg, max_len=16, stop_threshold=0.0,
                        use_megakernel=True)
    out = fn(variables, phoneme, lens)
    assert int(out["n_frames"]) == 1


def test_megakernel_padding_matches_xla():
    """Cross-attention key-padding bias must be wired identically to the
    XLA path when the batch row is shorter than the phoneme buffer.

    (Full invariance to pad CONTENT can't be asserted: the encoder prenet
    convs leak pad ids within their receptive field — same behavior in the
    XLA path and the reference.)"""
    cfg, model, variables, phoneme, lens = _setup()
    short = jnp.full_like(lens, 12)
    kwargs = dict(max_len=8, stop_threshold=2.0)
    ref = make_decode_fn(model, cfg, use_megakernel=False, **kwargs)(
        variables, phoneme, short)
    out = make_decode_fn(model, cfg, use_megakernel=True, **kwargs)(
        variables, phoneme, short)
    np.testing.assert_allclose(
        np.asarray(out["pred_melspec"]), np.asarray(ref["pred_melspec"]),
        atol=2e-4, rtol=1e-4,
    )


@pytest.mark.parametrize("r", [1, 2])
def test_batched_megakernel_matches_xla(r):
    """Forced batched megakernel (B=2, ragged lengths) == XLA decode."""
    cfg, model, variables, phoneme, lens = _setup(r)
    rng = np.random.default_rng(3)
    phoneme2 = jnp.concatenate(
        [phoneme, jnp.asarray(rng.integers(1, 60, phoneme.shape), jnp.int32)],
        axis=0)
    lens2 = jnp.array([int(lens[0]), int(lens[0]) - 5], jnp.int32)
    max_len = 8 * r
    kwargs = dict(max_len=max_len, stop_threshold=2.0)
    ref = make_decode_fn(model, cfg, use_megakernel=False, **kwargs)(
        variables, phoneme2, lens2)
    out = make_decode_fn(model, cfg, use_megakernel=True, **kwargs)(
        variables, phoneme2, lens2)
    assert out["pred_melspec"].shape[0] == 2
    np.testing.assert_allclose(
        np.asarray(out["pred_melspec"]), np.asarray(ref["pred_melspec"]),
        atol=2e-4, rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(out["pred_stop"]), np.asarray(ref["pred_stop"]),
        atol=2e-4, rtol=1e-4)


def test_fits_gate_matches_hardware_evidence():
    """decode_step_fits models the round-4 on-chip compile outcomes:
    B<=8 at serving shapes loads (operands sit outside the scoped limit;
    B=4 compiled with ~50 MB of caches, B=8's stack fits the requested
    64 MiB), while B>=12 and the d1024 shape exceed total VMEM."""
    from transformertts_tpu.config import load_config
    from transformertts_tpu.ops.pallas.decode_step import decode_step_fits

    cfg = load_config(None, [])
    for b in (1, 2, 4, 8):
        assert decode_step_fits(cfg, 1500, 256, batch=b), b
    assert not decode_step_fits(cfg, 1500, 256, batch=12)
    assert not decode_step_fits(cfg, 1500, 256, batch=16)

    d1024 = load_config("configs/large_tp.yaml", [])
    assert not decode_step_fits(d1024, 1024, 192, batch=1)
