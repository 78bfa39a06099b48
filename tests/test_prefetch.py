"""Prefetcher: ordering, completeness, exception propagation."""

import time

import pytest

from adafocus_tpu.data.prefetch import prefetch_to_device


def test_order_and_completeness():
    raws = list(range(7))
    out = list(prefetch_to_device(raws, lambda r, i: (r * 2, i), depth=2))
    assert out == [(r * 2, i) for i, r in enumerate(raws)]


def test_overlap_actually_happens():
    timeline = []

    def slow_prep(r, i):
        timeline.append(("prep", i, time.perf_counter()))
        time.sleep(0.02)
        return r

    consumed = []
    for item in prefetch_to_device(range(5), slow_prep, depth=2):
        time.sleep(0.02)  # simulate a device step
        consumed.append(item)
    assert consumed == list(range(5))
    # by the time we consume item 0 (>= 0.02s in), prep of item 1 must have
    # already started (overlap), i.e. its start time < first consume end
    assert timeline[1][2] < timeline[0][2] + 0.04


def test_exception_propagates():
    def bad(r, i):
        if i == 2:
            raise ValueError("boom")
        return r

    with pytest.raises(ValueError, match="boom"):
        list(prefetch_to_device(range(5), bad))
