import math

import numpy as np
from scipy.fft import dct as scipy_dct

import jax.numpy as jnp

from transformertts_tpu.train.metrics import (
    _dct_matrix,
    mel_cepstral_distortion,
    stop_token_metrics,
)


def test_dct_matrix_matches_scipy():
    n = 80
    mat = _dct_matrix(n)
    x = np.random.default_rng(0).standard_normal(n).astype(np.float32)
    ref = scipy_dct(x, type=2, norm="ortho")
    np.testing.assert_allclose(mat @ x, ref, atol=1e-4)


def test_mcd_zero_for_identical():
    rng = np.random.default_rng(1)
    mel = jnp.asarray(rng.standard_normal((2, 30, 80)), jnp.float32)
    lens = jnp.array([30, 20])
    assert float(mel_cepstral_distortion(mel, mel, lens)) < 1e-3


def test_mcd_positive_and_padding_invariant():
    rng = np.random.default_rng(2)
    mel = jnp.asarray(rng.standard_normal((2, 30, 80)), jnp.float32)
    # non-constant perturbation (a constant shift lives in the dropped c0)
    pred = mel + jnp.asarray(rng.standard_normal((2, 30, 80)) * 0.5, jnp.float32)
    lens = jnp.array([30, 15])
    d1 = float(mel_cepstral_distortion(pred, mel, lens))
    assert d1 > 0.1
    # scribbling on padding doesn't change the metric
    pred2 = pred.at[1, 15:].add(100.0)
    d2 = float(mel_cepstral_distortion(pred2, mel, lens))
    assert abs(d1 - d2) < 1e-4


def test_stop_metrics_perfect():
    lens = jnp.array([5, 3])
    logits = jnp.full((2, 6), -10.0)
    logits = logits.at[0, 4].set(10.0).at[1, 2].set(10.0)
    m = stop_token_metrics(logits, lens)
    assert float(m["stop_accuracy"]) == 1.0
    assert float(m["stop_recall"]) == 1.0


def test_stop_metrics_miss():
    lens = jnp.array([4])
    logits = jnp.full((1, 4), -10.0)  # never fires
    m = stop_token_metrics(logits, lens)
    assert float(m["stop_recall"]) == 0.0
    assert float(m["stop_accuracy"]) == 0.75  # 3/4 correct negatives


def test_stop_recall_tolerant_window():
    """stop_recall_2 counts a row when any frame within ±2 of the true
    stop frame fires, while strict stop_recall requires the exact frame."""
    import jax.numpy as jnp

    from transformertts_tpu.train.metrics import stop_token_metrics

    t = 12
    lengths = jnp.array([10, 10])
    logits = jnp.full((2, t), -10.0)
    # row 0: fires 2 frames early (index 7; exact would be 9)
    logits = logits.at[0, 7].set(10.0)
    # row 1: fires exactly at index 9
    logits = logits.at[1, 9].set(10.0)
    m = stop_token_metrics(logits, lengths)
    assert float(m["stop_recall"]) == 0.5
    assert float(m["stop_recall_2"]) == 1.0


def test_stop_recall_tolerant_ignores_padding_rows():
    """Bucket-padded dummy rows (length 0) must not dilute the tolerant
    recall: it must never read below the strict recall (regression — the
    mean used to run over ALL rows, halving recall_2 in half-padded
    batches)."""
    import jax.numpy as jnp

    from transformertts_tpu.train.metrics import stop_token_metrics

    t = 12
    lengths = jnp.array([10, 0, 0, 0])  # one real row, three pad rows
    logits = jnp.full((4, t), -10.0)
    logits = logits.at[0, 9].set(10.0)  # real row fires exactly
    m = stop_token_metrics(logits, lengths)
    assert float(m["stop_recall"]) == 1.0
    assert float(m["stop_recall_2"]) == 1.0
    assert float(m["stop_recall_2"]) >= float(m["stop_recall"])


def test_mcd_dtw_zero_for_identical():
    from transformertts_tpu.train.metrics import mcd_dtw

    rng = np.random.default_rng(0)
    mel = rng.normal(size=(50, 80)).astype(np.float32)
    assert mcd_dtw(mel, mel) < 1e-3


def test_mcd_dtw_forgives_tempo_warp():
    """A 2x time-stretched copy of the same spectral content: frame-wise
    MCD explodes (it compares mismatched phones), DTW-MCD stays ~0 — the
    property that makes it the fair free-running metric."""
    from transformertts_tpu.train.metrics import mcd_dtw, mel_cepstral_distortion

    rng = np.random.default_rng(1)
    mel = rng.normal(size=(40, 80)).astype(np.float32)
    slow = np.repeat(mel, 2, axis=0)  # (80, 80): each frame held twice
    m = mel.shape[0]
    framewise = float(
        mel_cepstral_distortion(slow[None, :m], mel[None], np.array([m]))
    )
    aligned = mcd_dtw(slow, mel)
    assert aligned < 1e-3
    assert framewise > 10.0


def test_mcd_dtw_positive_for_different_content():
    from transformertts_tpu.train.metrics import mcd_dtw

    rng = np.random.default_rng(2)
    a = rng.normal(size=(30, 80)).astype(np.float32)
    b = rng.normal(size=(45, 80)).astype(np.float32)
    assert mcd_dtw(a, b) > 1.0
