"""Host->device prefetch pipeline: ordering, exception propagation,
and overlap."""

import threading

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
    """With depth 2 the producer runs AHEAD of the consumer — while the
    consumer still holds item 0, the producer must reach the transfer
    of item 2 on its own (a synchronous pipeline never would) — but
    stays BOUNDED: with queue capacity 2, the transfer of item 4
    requires the consumer to have taken item 1 first, so an eager
    transfer-everything-then-yield implementation fails here.
    Event-based, so immune to scheduling jitter on a loaded box,
    unlike a wall-clock-ratio assertion."""
    ahead = threading.Event()
    too_far = threading.Event()

    def transfer(x):
        if x == 2:
            ahead.set()
        if x == 4:
            too_far.set()
        return x

    consumed = []
    for item in prefetch(range(6), transfer, depth=2):
        if item == 0:
            assert ahead.wait(timeout=30.0), (
                "producer never prefetched item 2 while the consumer "
                "held item 0")
            assert not too_far.is_set(), (
                "producer ran unboundedly ahead: transfer(4) cannot "
                "legally start before the consumer takes item 1")
        consumed.append(item)
    assert consumed == [0, 1, 2, 3, 4, 5]
