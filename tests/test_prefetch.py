import time

import pytest

from transformertts_tpu.data.prefetch import prefetch


def test_prefetch_order_and_completeness():
    assert list(prefetch(range(100))) == list(range(100))


def test_prefetch_overlaps():
    def slow_producer():
        for i in range(5):
            time.sleep(0.05)
            yield i

    t0 = time.perf_counter()
    for i in prefetch(slow_producer()):
        time.sleep(0.05)  # consumer work overlaps producer work
    elapsed = time.perf_counter() - t0
    # serial would be ~0.5s; overlapped ~0.3s
    assert elapsed < 0.45


def test_prefetch_propagates_errors():
    def bad():
        yield 1
        raise RuntimeError("boom")

    it = prefetch(bad())
    assert next(it) == 1
    with pytest.raises(RuntimeError, match="boom"):
        list(it)
