"""Asynchronous input pipeline: worker-pooled sample loading + batch
prefetch with device placement.

The reference hides its CPU data work (augmentation, GT-database paste,
collate) behind torch ``DataLoader`` worker processes
(``workers_per_gpu`` in every dataset config, e.g.
``/root/reference/configs/_base_/datasets/kitti-3d-3class.py``).  The plain
loop in ``engine/loop.py`` would instead stall the device every step.

TPU-native equivalent, sized for small hosts:

* ``sample_pool`` — a thread pool maps ``dataset[idx]`` over the indices of
  the next batches.  The pipeline is numpy-dominated (point IO, rotations,
  dbsampler collision checks), which releases the GIL, so threads scale
  without the fork/pickle overhead of process workers.
* ``Prefetcher`` — one producer thread assembles collated batches into a
  bounded queue, optionally applying ``place_fn`` (``shard_batch`` — i.e.
  H2D transfer to the mesh) *inside* the producer so the transfer also
  overlaps the device step.

With queue depth 2 the device never waits on the host unless the pipeline
is genuinely slower than the step.
"""
from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Iterator, Optional

__all__ = ['Prefetcher', 'prefetch']

_STOP = object()


class Prefetcher:
    """Wrap a batch iterator with a background producer + bounded queue.

    Call :meth:`close` when abandoning the iterator early (e.g. a
    ``max_steps`` break mid-epoch) — it unblocks and joins the producer so
    repeated short runs don't accumulate threads parked on ``q.put``.
    """

    def __init__(self, it: Iterator, depth: int = 2,
                 place_fn: Optional[Callable] = None):
        self._q = queue.Queue(maxsize=max(1, depth))
        self._place = place_fn
        self._err = None
        self._stop = False
        self._thread = threading.Thread(
            target=self._produce, args=(it,), daemon=True)
        self._thread.start()

    def _produce(self, it):
        try:
            for item in it:
                if self._place is not None:
                    item = self._place(item)
                while not self._stop:
                    try:
                        self._q.put(item, timeout=0.2)
                        break
                    except queue.Full:
                        continue
                if self._stop:
                    return
        except BaseException as e:   # surfaced on the consumer side
            self._err = e
        finally:
            try:
                self._q.put_nowait(_STOP)
            except queue.Full:
                pass
        # iterator closed here (thread scope) so pooled workers wind down

    def close(self):
        """Stop the producer and join it; safe to call multiple times."""
        self._stop = True
        while True:            # drain so a blocked put can observe _stop
            try:
                self._q.get_nowait()
            except queue.Empty:
                break
        self._thread.join(timeout=30)

    def __iter__(self):
        return self

    def __next__(self):
        item = self._q.get()
        if item is _STOP:
            self._thread.join()
            if self._err is not None:
                raise self._err
            raise StopIteration
        return item


def prefetch(it: Iterator, depth: int = 2,
             place_fn: Optional[Callable] = None) -> Iterator:
    """Functional wrapper: ``for batch in prefetch(make_iter(...), 2, put)``."""
    return Prefetcher(it, depth=depth, place_fn=place_fn)


def pooled_sample_iterator(ds, order, batch_size: int, collate_fn,
                           workers: int = 2, pad_partial: bool = False):
    """Iterator of collated batches with ``dataset[idx]`` mapped on a thread
    pool (the reference's ``workers_per_gpu`` analogue).

    Samples are requested ``workers``-wide but yielded in order, so the
    epoch's batch composition is identical to the serial loop.  ``None``
    items (filtered samples) are skipped like the serial path.

    Determinism note: with ``workers > 1`` the augmentation transforms'
    ``RandomState`` draws interleave across threads, so augmentations are
    not bit-reproducible run-to-run — the same trade the reference makes
    with multi-worker torch DataLoaders.  Set ``workers_per_gpu=1`` for
    bit-deterministic epochs.
    """
    order = [int(i) for i in order]
    if workers <= 1:
        def serial():
            buf = []
            for idx in order:
                item = ds[idx]
                if item is None:
                    continue
                buf.append(item)
                if len(buf) == batch_size:
                    yield collate_fn(buf)
                    buf = []
            if buf and pad_partial:
                while len(buf) < batch_size:
                    buf.append(buf[-1])
                yield collate_fn(buf)
        return serial()

    def pooled():
        # bounded sliding window of in-flight futures (plain pool.map would
        # submit the whole epoch and buffer every completed sample)
        window = 2 * workers
        from collections import deque
        with ThreadPoolExecutor(max_workers=workers) as pool:
            futs = deque()
            it = iter(order)
            for idx in it:
                futs.append(pool.submit(ds.__getitem__, idx))
                if len(futs) >= window:
                    break
            buf = []
            while futs:
                item = futs.popleft().result()
                nxt = next(it, None)
                if nxt is not None:
                    futs.append(pool.submit(ds.__getitem__, nxt))
                if item is None:
                    continue
                buf.append(item)
                if len(buf) == batch_size:
                    yield collate_fn(buf)
                    buf = []
            if buf and pad_partial:
                while len(buf) < batch_size:
                    buf.append(buf[-1])
                yield collate_fn(buf)
    return pooled()
