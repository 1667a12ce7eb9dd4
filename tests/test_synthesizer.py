"""High-level Synthesizer API on the trained tiny checkpoint."""

import numpy as np

from transformertts_tpu.config import load_config
from transformertts_tpu.infer import Synthesizer

from tests.test_data import corpus  # noqa: F401
from tests.test_trainer import trained  # noqa: F401


def test_synthesizer_from_checkpoint(trained):  # noqa: F811
    cfg, exp, _, _ = trained
    synth = Synthesizer(cfg, exp / "run1" / "checkpoints")
    mels = synth.synthesize(["Hello world.", "A second, longer sentence here."],
                            max_len=12)
    assert len(mels) == 2
    for mel in mels:
        assert mel.shape[0] == 80
        assert mel.shape[1] >= 1
        assert np.isfinite(mel).all()


def test_synthesizer_stream(trained):  # noqa: F811
    cfg, exp, _, _ = trained
    synth = Synthesizer(cfg, exp / "run1" / "checkpoints")
    chunks = list(synth.stream("Hello world.", chunk=4, max_len=12))
    assert chunks, "no chunks yielded"
    mel = np.concatenate(chunks, axis=1)
    assert mel.shape[0] == 80 and 1 <= mel.shape[1] <= 12
    assert np.isfinite(mel).all()
    # streamed output == one-shot synthesis over the emitted frames
    oneshot = synth.synthesize("Hello world.", max_len=12)[0]
    np.testing.assert_allclose(mel, oneshot[:, : mel.shape[1]], atol=2e-2)


def test_synthesizer_wav(trained):  # noqa: F811
    cfg, exp, _, _ = trained
    synth = Synthesizer(cfg, exp / "run1" / "checkpoints")
    y = synth.synthesize_wav("Test.", max_len=12)
    assert y.ndim == 1 and len(y) > 0
    assert np.abs(y).max() <= 1.0


def test_synthesizer_warmup(trained):  # noqa: F811
    """warmup() compiles one decode graph per (bucket, batch) pair and
    synthesis works afterwards (production cold-start killer)."""
    cfg, exp, _, _ = trained
    synth = Synthesizer(cfg, exp / "run1" / "checkpoints")
    n = synth.warmup(batch_sizes=(1, 2), buckets=(cfg.runtime.phoneme_buckets[0],),
                     max_len=12)
    assert n == 2
    mel = synth.synthesize("Hello world.", max_len=12)[0]
    assert mel.shape[0] == 80 and np.isfinite(mel).all()


def test_synthesizer_windowed(trained):  # noqa: F811
    """Synthesizer at the flagship operating point (decode_attn_window=2,
    configs/flagship.yaml): windowed decode through the high-level API."""
    import dataclasses

    cfg, exp, _, _ = trained
    cfg_w = cfg.replace(
        runtime=dataclasses.replace(cfg.runtime, decode_attn_window=2))
    synth = Synthesizer(cfg_w, exp / "run1" / "checkpoints")
    mels = synth.synthesize(["Hello world.", "Another one."], max_len=12)
    assert len(mels) == 2
    for mel in mels:
        assert mel.shape[0] == 80 and np.isfinite(mel).all()
