"""Device prefetch + generator-fed pipelines.

Two components:

1. ``DevicePrefetcher`` — double-buffered host→HBM prefetch: keeps
   ``depth`` batches in flight on device so the TPU never waits on host
   transfer. This replaces the overlap the reference got from TF's C++
   queue runners executing concurrently with sess.run (SURVEY §2.10).

2. ``GeneratorDataSet`` — the rebuild of the custom threaded FIFO feeder
   (reference utils/threaded_dataset.py:61-166): wraps an arbitrary Python
   generator in daemon threads pushing into a bounded queue with
   backpressure, with a clean stop protocol (the Coordinator dance at
   reference utils/threaded_dataset.py:137-147 becomes a threading.Event).
"""

from __future__ import annotations

import collections
import queue
import threading
from typing import Callable, Dict, Iterator

import jax
import numpy as np

from segmentation_tpu.core import mesh as mesh_lib


class DevicePrefetcher:
    """Wraps a host batch iterator; keeps ``depth`` batches resident on
    device (batch-sharded over the mesh).

    The fetch + ``device_put`` run on a dedicated STAGING THREAD, not the
    consumer: on a single-core host the consumer thread is also the thread
    dispatching TPU steps, and doing the host→device copy there serializes
    transfer with dispatch (measured as the round-2 e2e gap — 8.7 img/s
    e2e vs ~90 img/s loader-alone). The staging thread holds the GIL only
    for the numpy view + async device_put enqueue; decode workers (C++ or
    loader threads) and the device transfer proceed concurrently with the
    training step. ``jax.device_put`` is itself async, so up to ``depth``
    transfers are in flight behind the running step."""

    _SENTINEL = object()

    def __init__(self, source, mesh=None, depth: int = 2):
        # Accept either a dataset object (get_batch + attrs, delegated) or a
        # plain iterator of batch dicts.
        self._base = source if hasattr(source, "get_batch") else None
        self.source = iter(source)
        self.mesh = mesh if mesh is not None else mesh_lib.make_mesh()
        self.depth = max(1, depth)
        self._q: "queue.Queue" = queue.Queue(maxsize=self.depth)
        self._stop = threading.Event()
        self._thread = threading.Thread(
            target=self._stage, daemon=True, name="seg-device-prefetch"
        )
        self._started = False

    def __getattr__(self, name):
        base = self.__dict__.get("_base")
        if base is not None:
            return getattr(base, name)
        raise AttributeError(name)

    def _stage(self):
        try:
            while not self._stop.is_set():
                try:
                    batch = next(self.source)
                except StopIteration:
                    self._put(self._SENTINEL)
                    return
                self._put(mesh_lib.shard_batch(self.mesh, batch))
        except BaseException as e:  # surface worker crashes to the consumer
            self._put(e)

    def _put(self, item):
        while not self._stop.is_set():
            try:
                self._q.put(item, timeout=0.2)
                return
            except queue.Full:
                continue

    def __iter__(self):
        return self

    def __next__(self):
        if not self._started:
            self._started = True
            self._thread.start()
        out = self._q.get()
        if out is self._SENTINEL:
            raise StopIteration
        if isinstance(out, BaseException):
            raise RuntimeError("prefetch staging thread failed") from out
        return out

    def get_batch(self):
        return next(self)

    def stop(self):
        self._stop.set()
        try:  # drain so the staging thread unblocks
            while True:
                self._q.get_nowait()
        except queue.Empty:
            pass
        base = self.__dict__.get("_base")
        if base is not None and hasattr(base, "stop"):
            base.stop()


class GeneratorDataSet:
    """Threaded feeder over a user generator function
    (reference utils/threaded_dataset.py 'Generator'). ``gen_fn(worker_id)``
    must return an iterator of batch dicts; ``threads`` workers run it
    concurrently; ``capacity`` bounds the buffer (the FIFOQueue size-poll
    backpressure at reference utils/threaded_dataset.py:137-142).

    Conscious omission: the reference's ``M0M1`` paired-dataset wrapper
    (utils/threaded_dataset.py:28-49) has no named equivalent here. It is
    vestigial upstream — it imports a missing ``image_utils`` module
    (utils/threaded_dataset.py:8-9) so it cannot run — and its mechanism
    (two coupled streams through one feeder) is subsumed by passing a
    ``gen_fn`` that yields dicts with both modalities as keys."""

    has_masks = False
    use_feed = False

    def __init__(
        self,
        gen_fn: Callable[[int], Iterator[Dict[str, np.ndarray]]],
        batch_size: int,
        capacity: int = 8,
        threads: int = 1,
        has_masks: bool = False,
    ):
        self.gen_fn = gen_fn
        self.batch_size = batch_size
        self.has_masks = has_masks
        self._q: "queue.Queue" = queue.Queue(maxsize=max(2, capacity))
        self._stop = threading.Event()
        self._threads = [
            threading.Thread(
                target=self._main, args=(i,), daemon=True,
                name=f"seg-gen-{i}",
            )
            for i in range(max(1, threads))
        ]
        self._started = False

    def _main(self, worker_id: int):
        it = self.gen_fn(worker_id)
        while not self._stop.is_set():
            try:
                item = next(it)
            except StopIteration:
                it = self.gen_fn(worker_id)  # loop forever, like the queues
                continue
            while not self._stop.is_set():
                try:
                    self._q.put(item, timeout=0.2)
                    break
                except queue.Full:
                    continue

    def start_threads(self):
        if not self._started:
            self._started = True
            for t in self._threads:
                t.start()

    def request_stop(self):
        self._stop.set()
        try:
            while True:
                self._q.get_nowait()
        except queue.Empty:
            pass

    def set_tf_sess(self, sess):
        return

    def dequeue(self):
        if not self._started:
            self.start_threads()
        return self._q.get()

    def get_batch(self):
        return self.dequeue()

    def __iter__(self):
        while True:
            yield self.get_batch()
