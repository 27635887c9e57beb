"""Prefetch iterator: ordering, completeness, exception propagation."""

import time

import pytest

from mimrl_tpu.data.pipeline import prefetch


def test_prefetch_preserves_order():
    assert list(prefetch(iter(range(50)), 4)) == list(range(50))


def test_prefetch_overlaps():
    def slow_producer():
        for i in range(5):
            time.sleep(0.02)
            yield i

    t0 = time.perf_counter()
    total = 0
    for item in prefetch(slow_producer(), 2):
        time.sleep(0.02)  # consumer work overlapping producer work
        total += item
    elapsed = time.perf_counter() - t0
    assert total == 10
    # serial would be ~0.2s; overlapped should be meaningfully less
    assert elapsed < 0.18, elapsed


def test_prefetch_propagates_exception():
    def bad():
        yield 1
        raise ValueError("boom")

    it = prefetch(bad(), 2)
    assert next(it) == 1
    with pytest.raises(ValueError, match="boom"):
        list(it)
