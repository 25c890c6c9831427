"""Async input pipeline (engine/prefetch.py): ordering, None-skip,
padding, error propagation, bounded in-flight window."""
import threading
import time

import numpy as np
import pytest

from mmdet3d_gaussian_tpu.engine.prefetch import (Prefetcher, prefetch,
                                                  pooled_sample_iterator)


class FakeDS:
    def __init__(self, n, none_at=(), delay=0.0):
        self.n = n
        self.none_at = set(none_at)
        self.delay = delay
        self.inflight = 0
        self.max_inflight = 0
        self._lock = threading.Lock()

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        with self._lock:
            self.inflight += 1
            self.max_inflight = max(self.max_inflight, self.inflight)
        if self.delay:
            time.sleep(self.delay)
        with self._lock:
            self.inflight -= 1
        return None if i in self.none_at else {'idx': np.int32(i)}


def collate(items):
    return [it['idx'] for it in items]


@pytest.mark.parametrize('workers', [1, 3])
def test_pooled_iterator_matches_serial_semantics(workers):
    ds = FakeDS(13, none_at={2, 7})
    batches = list(pooled_sample_iterator(ds, range(13), 4, collate,
                                          workers=workers))
    flat = [int(x) for b in batches for x in b]
    # Nones skipped, order preserved, remainder dropped (pad_partial=False)
    assert flat == [0, 1, 3, 4, 5, 6, 8, 9]
    assert all(len(b) == 4 for b in batches)


def test_pooled_iterator_pads_partial():
    ds = FakeDS(5)
    batches = list(pooled_sample_iterator(ds, range(5), 4, collate,
                                          workers=2, pad_partial=True))
    assert [int(x) for x in batches[-1]] == [4, 4, 4, 4]


def test_pooled_iterator_bounded_inflight():
    ds = FakeDS(40, delay=0.005)
    list(pooled_sample_iterator(ds, range(40), 4, collate, workers=2))
    assert ds.max_inflight <= 2   # pool width, not the whole epoch


def test_prefetcher_yields_all_and_applies_place_fn():
    out = list(prefetch(iter(range(7)), depth=2, place_fn=lambda x: x * 10))
    assert out == [0, 10, 20, 30, 40, 50, 60]


def test_prefetcher_propagates_producer_error():
    def gen():
        yield 1
        raise ValueError('boom')

    it = Prefetcher(gen(), depth=2)
    assert next(it) == 1
    with pytest.raises(ValueError, match='boom'):
        list(it)


def test_prefetcher_close_unblocks_producer():
    ds = FakeDS(100, delay=0.001)
    it = pooled_sample_iterator(ds, range(100), 4, collate, workers=2)
    pf = Prefetcher(it, depth=1)
    next(pf)                      # start consuming, then abandon early
    pf.close()
    assert not pf._thread.is_alive()
