"""C++ npz batch loader == numpy path, bit-exact."""

import numpy as np
import pytest

from transformertts_tpu.data import BucketedLoader, LJSpeechDataset
from transformertts_tpu.native import NativeBatchLoader, native_available

from tests.test_data import corpus  # noqa: F401  (fixture)

pytestmark = pytest.mark.skipif(
    not native_available(), reason="no C++ toolchain for native loader"
)


def test_native_matches_numpy(corpus):  # noqa: F811
    _, out, _ = corpus
    ds = LJSpeechDataset(out, "train")
    loader = NativeBatchLoader(ds.files)
    idxs = np.arange(len(ds), dtype=np.int32)
    bp, bm = 64, 512
    batch = loader.load_batch(idxs, bp, bm, 80)

    for row, i in enumerate(idxs):
        item = ds[int(i)]
        seq, mel = item["sequence"], item["melspec"]  # mel (T, n_mels)
        assert batch["phoneme_lens"][row] == len(seq)
        assert batch["melspec_lens"][row] == mel.shape[0]
        np.testing.assert_array_equal(batch["phoneme"][row, : len(seq)], seq)
        assert (batch["phoneme"][row, len(seq):] == 0).all()
        np.testing.assert_array_equal(batch["melspec"][row, : mel.shape[0]], mel)
        assert (batch["melspec"][row, mel.shape[0]:] == 0).all()
    loader.close()


def test_bucketed_loader_uses_native(corpus):  # noqa: F811
    _, out, _ = corpus
    ds = LJSpeechDataset(out, "train")
    kw = dict(batch_size=2, grad_acc_steps=1, phoneme_buckets=(64,),
              mel_buckets=(512,), drop_last=False, shuffle=False)
    native = BucketedLoader(ds, use_native=True, **kw)
    plain = BucketedLoader(ds, use_native=False, **kw)
    assert native._native is not None
    for b_n, b_p in zip(native.epoch(0), plain.epoch(0)):
        for key in b_p:
            np.testing.assert_array_equal(b_n[key], b_p[key], err_msg=key)


def test_truncation(corpus):  # noqa: F811
    _, out, _ = corpus
    ds = LJSpeechDataset(out, "train")
    loader = NativeBatchLoader(ds.files)
    batch = loader.load_batch(np.array([0], np.int32), 4, 8, 80)
    assert batch["phoneme_lens"][0] <= 4
    assert batch["melspec_lens"][0] <= 8
    loader.close()
