"""Keyed batch coalescer: the shared machinery under the streaming mux
and the query coalescer.

Pattern (continuous-batching style): items that arrive while a dispatch
is in flight accumulate and ride the NEXT batch together — the previous
dispatch IS the accumulation window, no artificial wait. Only same-key
items batch (the key carries whatever selects the compiled program /
batch parameters); mixed keys ship in consecutive rounds, each round one
key group, so no key can starve another.

One worker thread owns all dispatches, which also restores the
one-device-writer invariant that per-request/per-session threads would
break when sharing one backend. ``linger_s``: after a round's first
item, keep draining until no new item has arrived for this long — when
a batch completes, ALL waiting clients wake at once but the single host
CPU resumes them one at a time, so without a linger the first
resubmission ships alone at the full padded-dispatch price (measured 2×
batch under-fill in the streaming mux; a few ms is noise against
seconds-scale client cadences).

Subclasses implement :meth:`_run_batch`; per-item results resolve each
item's future.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import Future
from typing import Any, Sequence

from audio_rag_tpu.utils.logging import get_logger

log = get_logger(__name__)

__all__ = ["KeyedCoalescer", "PendingItem"]


class PendingItem:
    """One queued item: a payload, its batch key, and its future."""

    __slots__ = ("payload", "key", "future")

    def __init__(self, payload: Any, key: tuple):
        self.payload = payload
        self.key = key
        self.future: Future = Future()


class KeyedCoalescer:
    """Base batching worker; see module docstring."""

    #: thread name for the worker
    worker_name = "coalescer"
    #: seconds to wait for the worker on stop()
    join_timeout_s = 10.0

    def __init__(self, max_batch: int, linger_s: float = 0.0):
        self.max_batch = max_batch
        self.linger_s = linger_s
        self._queue: "queue.Queue[PendingItem | None]" = queue.Queue()
        # serializes _submit() against stop(): without it a submit that
        # read _stopped == False can be preempted through ALL of stop()
        # (flag, sentinel, join, drain) and then land its item in a
        # queue nobody reads — the client blocks forever on its future
        self._submit_lock = threading.Lock()
        self._stopped = False
        self.batches_run = 0
        self.items_served = 0
        self._thread = threading.Thread(
            target=self._loop, name=self.worker_name, daemon=True)
        self._thread.start()

    # -- client API ------------------------------------------------------
    def _submit(self, payload: Any, key: tuple) -> Future:
        p = PendingItem(payload, key)
        with self._submit_lock:
            if self._stopped:
                raise RuntimeError(f"{self.worker_name} stopped")
            self._queue.put(p)
        return p.future

    def stop(self) -> None:
        with self._submit_lock:
            if self._stopped:
                return
            self._stopped = True
            self._queue.put(None)
        self._thread.join(timeout=self.join_timeout_s)
        # fail any stragglers the worker requeued behind the sentinel
        # instead of leaving their futures hanging forever
        while True:
            try:
                p = self._queue.get_nowait()
            except queue.Empty:
                break
            if p is not None and not p.future.done():
                p.future.set_exception(
                    RuntimeError(f"{self.worker_name} stopped"))

    # -- subclass contract -------------------------------------------------
    def _run_batch(self, payloads: list, key: tuple) -> Sequence:
        """Dispatch one same-key batch; return one result per payload."""
        raise NotImplementedError

    # -- worker ------------------------------------------------------------
    def _next(self) -> "PendingItem | None":
        """Next queued item during the drain: linger past the last
        arrival when configured, else take only what's already queued."""
        if self.linger_s > 0:
            return self._queue.get(timeout=self.linger_s)
        return self._queue.get_nowait()

    def _loop(self) -> None:
        while True:
            item = self._queue.get()
            if item is None:
                return
            batch = [item]
            requeue = []
            while len(batch) < self.max_batch:
                try:
                    nxt = self._next()
                except queue.Empty:
                    break
                if nxt is None:
                    self._queue.put(None)
                    break
                if nxt.key == item.key:
                    batch.append(nxt)
                else:
                    requeue.append(nxt)
            for p in requeue:
                self._queue.put(p)

            try:
                results = self._run_batch(
                    [p.payload for p in batch], item.key)
            except Exception as exc:
                for p in batch:
                    if not p.future.done():
                        p.future.set_exception(exc)
                continue
            self.batches_run += 1
            self.items_served += len(batch)
            for p, r in zip(batch, results):
                if not p.future.done():
                    p.future.set_result(r)
