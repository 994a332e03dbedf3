"""Query coalescer: concurrent search requests share one fused device batch.

The fused QueryEngine runs embed→score→RRF→top-k→rerank for a whole query
batch as ONE device program (~300 QPS at batch 128) — but the API serves
each request with its own single-query call, so concurrent traffic pays
one ~35 ms dispatch per request in FIFO order (~28 QPS ceiling). This
coalescer is the query-path analog of :class:`engine.scheduler.
GenerationScheduler`: requests that arrive while a batch is on the device
accumulate and go out together in the next one (continuous-batching style
— no artificial wait window; the previous dispatch IS the window).

Requests batch only when their device-relevant parameters agree
(top_k / search_type / collection / rerank); HyDE, generation, TTS and
metadata-filtered queries keep the single-request path (their extra
stages aren't part of the fused program).

The coalescer never touches the device from its own thread: batches run
through the caller-provided ``run_in`` executor (the API's single
device-work executor), preserving the one-device-thread invariant that
keeps pipeline/fused-engine state single-writer.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import Future
from dataclasses import dataclass, field

from audio_rag_tpu.utils.logging import get_logger

log = get_logger(__name__)

__all__ = ["QueryCoalescer"]


@dataclass
class _Pending:
    query: str
    key: tuple  # (top_k, search_type, collection, rerank)
    future: Future = field(default_factory=Future)


class QueryCoalescer:
    def __init__(self, pipeline, max_batch: int = 64, run_in=None):
        """``pipeline`` is a QueryPipeline (``query_batch`` provider);
        ``run_in(fn) -> result`` executes device work on the process's
        device-work thread (defaults to inline execution)."""
        self.pipeline = pipeline
        self.max_batch = max_batch
        self._run_in = run_in or (lambda fn: fn())
        self._queue: "queue.Queue[_Pending | None]" = queue.Queue()
        self._stopped = False
        self.batches_run = 0
        self.requests_served = 0
        self._thread = threading.Thread(
            target=self._loop, name="query-coalescer", daemon=True)
        self._thread.start()

    # -- client API ----------------------------------------------------
    def submit(self, query: str, top_k=None, search_type=None,
               collection=None, rerank=None) -> Future:
        if self._stopped:
            raise RuntimeError("coalescer stopped")
        p = _Pending(query, (top_k, search_type, collection, rerank))
        self._queue.put(p)
        return p.future

    def query(self, query: str, **kw):
        return self.submit(query, **kw).result()

    def stop(self) -> None:
        self._stopped = True
        self._queue.put(None)
        self._thread.join(timeout=10.0)
        # fail any stragglers that raced the stop flag (submitted after
        # the sentinel) instead of leaving their futures hanging forever
        while True:
            try:
                p = self._queue.get_nowait()
            except queue.Empty:
                break
            if p is not None and not p.future.done():
                p.future.set_exception(RuntimeError("coalescer stopped"))

    # -- worker ----------------------------------------------------------
    def _loop(self) -> None:
        while True:
            item = self._queue.get()
            if item is None:
                return
            batch = [item]
            # drain whatever accumulated while the previous batch ran;
            # only same-key requests ride together. Different-key
            # requests requeue: FIFO puts them behind anything that
            # arrived during this drain, but each loop iteration ships
            # exactly one key group, so every request is served within
            # a bounded number of rounds (no key can monopolize).
            requeue = []
            while len(batch) < self.max_batch:
                try:
                    nxt = self._queue.get_nowait()
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

            top_k, search_type, collection, rerank = item.key
            queries = [p.query for p in batch]
            try:
                results = self._run_in(lambda: self.pipeline.query_batch(
                    queries, top_k=top_k, search_type=search_type,
                    collection=collection, rerank=rerank))
            except Exception as exc:
                for p in batch:
                    if not p.future.done():
                        p.future.set_exception(exc)
                continue
            self.batches_run += 1
            self.requests_served += len(batch)
            for p, r in zip(batch, results):
                if not p.future.done():
                    p.future.set_result(r)
