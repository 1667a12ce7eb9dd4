import json
import wave
from pathlib import Path

import numpy as np
import pytest

from transformertts_tpu.config import load_config
from transformertts_tpu.data import BucketedLoader, LJSpeechDataset, load_stats, pick_bucket
from transformertts_tpu.data.audio_io import load_wav
from transformertts_tpu.data.preprocess import load_transcripts, preprocess


def write_wav(path, y, sr=22050):
    with wave.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes((np.clip(y, -1, 1) * 32767).astype("<i2").tobytes())


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    """Tiny fake LJSpeech corpus + run of the real preprocess pipeline."""
    root = tmp_path_factory.mktemp("lj")
    (root / "wavs").mkdir()
    rng = np.random.default_rng(0)
    ids = [f"LJ001-{i:04d}" for i in range(4)] + [f"LJ050-{i:04d}" for i in range(8)]
    lines = []
    for i, audio_id in enumerate(ids):
        dur = 4000 + 3000 * (i % 3)
        write_wav(root / "wavs" / f"{audio_id}.wav", rng.standard_normal(dur) * 0.1)
        lines.append(f"{audio_id}|Some text {i}|Some text {i}")
    (root / "metadata.csv").write_text("\n".join(lines))

    out = root / "preprocessed"
    cfg = load_config(None, [f"path.data={root}", f"path.preprocessed={out}"])
    preprocess(cfg)
    return root, out, cfg


def test_wav_roundtrip(tmp_path):
    y = np.sin(np.linspace(0, 100, 8000)).astype(np.float32) * 0.5
    write_wav(tmp_path / "a.wav", y)
    loaded, sr = load_wav(tmp_path / "a.wav", 22050)
    assert sr == 22050
    np.testing.assert_allclose(loaded, y, atol=1e-3)


def test_wav_resample(tmp_path):
    y = np.sin(2 * np.pi * 440 * np.arange(16000) / 16000).astype(np.float32)
    write_wav(tmp_path / "b.wav", y, sr=16000)
    loaded, sr = load_wav(tmp_path / "b.wav", 22050)
    assert sr == 22050
    assert abs(len(loaded) - 22050) < 10


def test_preprocess_outputs(corpus):
    root, out, cfg = corpus
    npz_files = list(out.glob("*.npz"))
    assert len(npz_files) == 12
    stats = load_stats(out)
    assert np.isfinite(stats["mean"]) and stats["std"] > 0
    with np.load(npz_files[0], allow_pickle=True) as z:
        assert z["melspec"].shape[0] == cfg.audio.n_mels
        assert z["sequence"].dtype == np.int32
        assert len(z["sequence"]) > 0
    # normalized corpus: overall mean ~0, std ~1
    all_mels = np.concatenate(
        [np.load(p)["melspec"].ravel() for p in npz_files]
    )
    assert abs(all_mels.mean()) < 0.15
    assert abs(all_mels.std() - 1.0) < 0.15


def test_preprocess_skips_when_nonempty(corpus):
    root, out, cfg = corpus
    from unittest.mock import patch

    import transformertts_tpu.data.preprocess as pp

    before = {p.name: p.stat().st_mtime for p in out.glob("*.npz")}
    with patch.object(pp.log, "info") as mock_info:
        preprocess(cfg)
    assert any("Skipping" in str(c) for c in mock_info.call_args_list)
    after = {p.name: p.stat().st_mtime for p in out.glob("*.npz")}
    assert before == after  # nothing rewritten


def test_split(corpus):
    _, out, _ = corpus
    train = LJSpeechDataset(out, "train")
    val = LJSpeechDataset(out, "val")
    assert len(val) == 4  # LJ001 prefix
    assert len(train) == 8
    item = train[0]
    assert item["melspec"].shape[1] == 80  # transposed to (T, n_mels)


def test_load_transcripts(tmp_path):
    meta = tmp_path / "metadata.csv"
    meta.write_text("id1|raw text|norm text\nid2|a|b\nbadline\n")
    t = load_transcripts(meta)
    assert t == {"id1": "norm text", "id2": "b"}


def test_pick_bucket():
    assert pick_bucket(5, (8, 16)) == 8
    assert pick_bucket(8, (8, 16)) == 8
    assert pick_bucket(9, (8, 16)) == 16
    assert pick_bucket(17, (8, 16)) is None


def test_bucketed_loader(corpus):
    _, out, _ = corpus
    ds = LJSpeechDataset(out, "train")
    loader = BucketedLoader(
        ds, batch_size=2, grad_acc_steps=2,
        phoneme_buckets=(32, 64), mel_buckets=(128, 256, 512),
        drop_last=False, seed=1,
    )
    batches = list(loader.epoch(0))
    assert len(batches) >= 1
    for b in batches:
        assert b["phoneme"].shape[:2] == (2, 2)
        assert b["melspec"].shape[:2] == (2, 2)
        assert b["melspec"].shape[3] == 80
        assert b["phoneme"].shape[2] in (32, 64)
        assert b["melspec"].shape[2] in (128, 256, 512)
        # sorted desc by phoneme length within each micro batch (ref collate)
        for k in range(2):
            lens = b["phoneme_lens"][k]
            assert (np.diff(lens) <= 0).all()
            # padding is zeros
            for j, L in enumerate(lens):
                assert (b["phoneme"][k, j, L:] == 0).all()

    # determinism per (seed, epoch); different epoch order differs
    again = list(loader.epoch(0))
    np.testing.assert_array_equal(batches[0]["phoneme"], again[0]["phoneme"])


def _record_schedule(loader, epoch=0):
    """Run one epoch recording (real item ids, bucket shape) per job."""
    jobs = []
    orig = loader._pad_batch

    def spy(idxs, bp, bm, n_real=None):
        n = len(idxs) if n_real is None else n_real
        jobs.append((tuple(int(i) for i in idxs[:n]), (bp, bm)))
        return orig(idxs, bp, bm, n_real)

    loader._pad_batch = spy
    try:
        for _ in loader.epoch(epoch):
            pass
    finally:
        loader._pad_batch = orig
    return jobs


def test_host_sharding(corpus):
    """Two hosts: identical job schedule (count, order, bucket shapes),
    disjoint real items, full coverage."""
    _, out, _ = corpus
    ds = LJSpeechDataset(out, "train")
    kw = dict(batch_size=1, grad_acc_steps=1, phoneme_buckets=(64,),
              mel_buckets=(512,), drop_last=False)
    l0 = BucketedLoader(ds, process_index=0, process_count=2, **kw)
    l1 = BucketedLoader(ds, process_index=1, process_count=2, **kw)
    j0, j1 = _record_schedule(l0), _record_schedule(l1)
    assert len(j0) == len(j1)
    assert [shape for _, shape in j0] == [shape for _, shape in j1]
    ids0 = {i for ids, _ in j0 for i in ids}
    ids1 = {i for ids, _ in j1 for i in ids}
    assert ids0.isdisjoint(ids1)
    assert len(ids0 | ids1) == len(ds)


def test_host_sharding_schedules_never_misalign():
    """Regression: a bucket whose size splits unevenly across hosts must
    still produce the SAME number of jobs on every host (a per-host bucket
    split gave host 0 an extra job -> collective deadlock in training)."""

    class FakeDS:
        def __init__(self, n):
            self.n = n

        def __len__(self):
            return self.n

        def lengths(self, i):
            return (10, 50)

        def __getitem__(self, i):
            return {
                "sequence": np.arange(1, 11, dtype=np.int32),
                "melspec": np.zeros((50, 80), np.float32),
                "transcript": "x",
            }

    ds = FakeDS(7)  # strided per-host split would be 4 / 3
    kw = dict(batch_size=1, grad_acc_steps=1, phoneme_buckets=(16,),
              mel_buckets=(64,), drop_last=True, use_native=False)
    l0 = BucketedLoader(ds, process_index=0, process_count=2, **kw)
    l1 = BucketedLoader(ds, process_index=1, process_count=2, **kw)
    j0, j1 = _record_schedule(l0), _record_schedule(l1)
    assert len(j0) == len(j1) == 3  # 7 items, global group 2, drop_last
    assert l0.batches_per_epoch() == l1.batches_per_epoch() == 3
    ids0 = {i for ids, _ in j0 for i in ids}
    ids1 = {i for ids, _ in j1 for i in ids}
    assert ids0.isdisjoint(ids1)


def test_preprocess_pallas_mel_matches_numpy(corpus, tmp_path):
    """use_pallas_mel path produces (near-)identical features."""
    root, out_np, _ = corpus
    from transformertts_tpu.config import load_config
    from transformertts_tpu.data.preprocess import preprocess as pp_run

    out_pl = tmp_path / "prep_pallas"
    cfg = load_config(None, [
        f"path.data={root}", f"path.preprocessed={out_pl}",
        "runtime.use_pallas_mel=true",
    ])
    pp_run(cfg)
    files = sorted(out_pl.glob("*.npz"))
    assert files
    for p in files[:3]:
        ref = np.load(out_np / p.name)["melspec"]
        got = np.load(p)["melspec"]
        assert got.shape == ref.shape
        np.testing.assert_allclose(got, ref, atol=0.05)


def test_partial_group_rows_masked(corpus):
    """Repeat-padded rows of a partial final group carry melspec_lens == 0."""
    _, out, _ = corpus
    ds = LJSpeechDataset(out, "train")  # 8 items
    loader = BucketedLoader(
        ds, batch_size=3, grad_acc_steps=1, phoneme_buckets=(64,),
        mel_buckets=(512,), drop_last=False, shuffle=False,
    )
    batches = list(loader.epoch(0))
    assert len(batches) == 3  # ceil(8/3)
    n_valid = sum(int((b["melspec_lens"][0] > 0).sum()) for b in batches)
    assert n_valid == 8  # every real item counted exactly once
    # at least one batch has a masked row
    assert any(int((b["melspec_lens"][0] == 0).sum()) > 0 for b in batches)


def test_device_batched_preprocess_matches_numpy(corpus, tmp_path):
    """runtime.use_pallas_mel=True routes preprocessing through the BATCHED
    on-device extraction (_device_mels: per-clip host reflect pad +
    zero-extension to quantized buckets + one fused kernel call per chunk,
    XLA rFFT off-TPU); outputs must match the per-clip numpy path with
    exact frame counts."""
    root, out, cfg = corpus
    import dataclasses

    cfg2 = cfg.replace(
        path=dataclasses.replace(cfg.path, preprocessed=str(tmp_path / "dev")),
        runtime=dataclasses.replace(cfg.runtime, use_pallas_mel=True),
    )
    preprocess(cfg2)
    for f in sorted(Path(out).glob("*.npz")):
        a = np.load(f)
        b = np.load(tmp_path / "dev" / f.name)
        assert a["melspec"].shape == b["melspec"].shape, f.name
        np.testing.assert_allclose(a["melspec"], b["melspec"], atol=2e-4)
