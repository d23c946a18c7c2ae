"""Host->device prefetch pipeline: ordering, exception propagation,
and overlap."""

import time

import numpy as np
import pytest

from scanpaths_tpu.data.prefetch import prefetch


def test_prefetch_preserves_order_and_values():
    batches = [{"x": np.full((2,), i)} for i in range(7)]
    out = list(prefetch(batches, lambda b: b["x"] * 2, depth=3))
    assert [int(o[0]) for o in out] == [0, 2, 4, 6, 8, 10, 12]


def test_prefetch_depth_zero_is_synchronous():
    out = list(prefetch(range(4), lambda x: x + 1, depth=0))
    assert out == [1, 2, 3, 4]


def test_prefetch_propagates_producer_errors():
    def gen():
        yield 1
        raise RuntimeError("loader died")

    it = iter(prefetch(gen(), lambda x: x, depth=2))
    assert next(it) == 1
    with pytest.raises(RuntimeError, match="loader died"):
        next(it)


def test_prefetch_overlaps_producer_with_consumer():
    """With depth 2, slow transfers run while the consumer 'computes':
    total time must be well below the serial sum."""
    n, cost = 6, 0.05

    def slow_transfer(x):
        time.sleep(cost)
        return x

    t0 = time.perf_counter()
    for _ in prefetch(range(n), slow_transfer, depth=2):
        time.sleep(cost)          # consumer work
    elapsed = time.perf_counter() - t0
    serial = 2 * n * cost
    assert elapsed < serial * 0.8, (elapsed, serial)
