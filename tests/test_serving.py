"""Dynamic-batching serving layer (infer/serving.py) on the tiny trained
checkpoint.  The reference has no serving surface (inference is a
notebook call, model/model.py:323); these tests pin the batching
semantics the TPU stack adds: coalescing, result fidelity vs the direct
API, failure delivery, clean shutdown, and the HTTP front-end."""

import io
import json
import threading
import urllib.request
from concurrent.futures import wait

import numpy as np
import pytest

from transformertts_tpu.infer import DynamicBatcher, Synthesizer, make_http_server

from tests.test_data import corpus  # noqa: F401
from tests.test_trainer import trained  # noqa: F401

TEXTS = [
    "Hello world.",
    "A second, longer sentence here.",
    "The printer made a book.",
    "Paper and ink.",
]


@pytest.fixture(scope="module")
def synth(trained):  # noqa: F811
    cfg, exp, _, _ = trained
    return Synthesizer(cfg, exp / "run1" / "checkpoints")


def test_batcher_matches_direct_synthesize(synth):
    direct = synth.synthesize(TEXTS, max_len=12)
    with DynamicBatcher(synth, max_batch=4, max_wait_ms=200, max_len=12) as b:
        futures = [b.submit(t) for t in TEXTS]
        wait(futures, timeout=120)
        served = [f.result() for f in futures]
    for d, s in zip(direct, served):
        assert s.dtype == np.float32
        np.testing.assert_allclose(d, s, atol=1e-5)
    stats = b.stats()
    assert stats["n_requests"] == 4
    # all 4 arrived before the first decode finished -> coalesced
    assert stats["n_batches"] <= 2
    assert stats["mean_batch"] >= 2.0


def test_batcher_respects_max_batch(synth):
    with DynamicBatcher(synth, max_batch=2, max_wait_ms=500, max_len=12) as b:
        futures = [b.submit(t) for t in TEXTS]
        wait(futures, timeout=120)
        for f in futures:
            assert f.result().shape[0] == 80
    assert max(b.batch_hist) <= 2


def test_batcher_failure_delivery(synth):
    with DynamicBatcher(synth, max_batch=2, max_wait_ms=50, max_len=12) as b:
        f = b.submit(12345)  # not a string: g2p raises inside the worker
        with pytest.raises(Exception):
            f.result(timeout=120)
    # worker survived the failure and the batcher closed cleanly
    assert b.stats()["n_requests"] == 0


def test_batcher_close_drains_leftover_requests():
    """A request still queued when the worker exits must get a failure,
    not hang its caller forever (round-4 review fix). Uses a fake synth
    whose decode blocks until released, so the timing is deterministic."""
    import threading as th

    release = th.Event()
    entered = th.Event()

    class SlowSynth:
        def synthesize(self, texts, max_len=None):
            entered.set()
            release.wait(timeout=60)
            return [np.zeros((80, 3), np.float32) for _ in texts]

    b = DynamicBatcher(SlowSynth(), max_batch=1, max_wait_ms=1)
    f1 = b.submit("a")          # worker picks this up and blocks
    assert entered.wait(timeout=30)
    f2 = b.submit("b")          # still queued when close() gives up waiting
    b.close(timeout=0.2)        # join times out: worker is mid-decode
    with pytest.raises(RuntimeError):
        f2.result(timeout=60)   # drained with a failure, not hung forever
    release.set()               # wedged worker comes back, finds sentinel
    assert f1.result(timeout=60).shape == (80, 3)
    with pytest.raises(RuntimeError):
        b.submit("c")           # and the batcher stays closed


def test_batcher_closed_rejects(synth):
    b = DynamicBatcher(synth, max_batch=2, max_wait_ms=10, max_len=12)
    b.close()
    with pytest.raises(RuntimeError):
        b.submit("too late")


def test_http_server_roundtrip(trained, synth):  # noqa: F811
    cfg, _, _, _ = trained
    with DynamicBatcher(synth, max_batch=4, max_wait_ms=100, max_len=12) as b:
        server = make_http_server(b, cfg, port=0)  # ephemeral port
        host, port = server.server_address[:2]
        t = threading.Thread(target=server.serve_forever, daemon=True)
        t.start()
        try:
            results: dict[str, np.ndarray] = {}

            def post(text):
                req = urllib.request.Request(
                    f"http://{host}:{port}/synthesize",
                    data=json.dumps({"text": text}).encode(),
                    headers={"Content-Type": "application/json"},
                )
                with urllib.request.urlopen(req, timeout=120) as r:
                    frames = int(r.headers["X-Mel-Frames"])
                    mel = np.load(io.BytesIO(r.read()))
                    assert mel.shape == (80, frames)
                    results[text] = mel

            threads = [threading.Thread(target=post, args=(t_,)) for t_ in TEXTS[:3]]
            for th in threads:
                th.start()
            for th in threads:
                th.join(timeout=120)
            assert len(results) == 3

            # health endpoint reports the served traffic
            with urllib.request.urlopen(
                f"http://{host}:{port}/healthz", timeout=30
            ) as r:
                h = json.loads(r.read())
            assert h["ok"] and h["n_requests"] == 3

            # bad requests fail cleanly
            req = urllib.request.Request(
                f"http://{host}:{port}/synthesize", data=b"not json",
            )
            with pytest.raises(urllib.error.HTTPError) as ei:
                urllib.request.urlopen(req, timeout=30)
            assert ei.value.code == 400
        finally:
            server.shutdown()
