"""Query coalescer: concurrent search requests share one fused device batch.

The fused QueryEngine runs embed→score→RRF→top-k→rerank for a whole query
batch as ONE device program (~300 QPS at batch 128) — but the API serves
each request with its own single-query call, so concurrent traffic pays
one ~35 ms dispatch per request in FIFO order (~28 QPS ceiling). Built on
:class:`~audio_rag_tpu.utils.coalescer.KeyedCoalescer` (shared with the
streaming mux): requests that arrive while a batch is on the device
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

from concurrent.futures import Future

from audio_rag_tpu.utils.coalescer import KeyedCoalescer
from audio_rag_tpu.utils.logging import get_logger

log = get_logger(__name__)

__all__ = ["QueryCoalescer"]


class QueryCoalescer(KeyedCoalescer):
    worker_name = "query-coalescer"
    join_timeout_s = 10.0

    def __init__(self, pipeline, max_batch: int = 64, run_in=None,
                 linger_s: float = 0.0):
        """``pipeline`` is a QueryPipeline (``query_batch`` provider);
        ``run_in(fn) -> result`` executes device work on the process's
        device-work thread (defaults to inline execution). ``linger_s``:
        keep draining the queue this long after each item — batch-
        completion wakes are serialized by the single host CPU, so
        without it the first resubmission ships nearly alone at the full
        padded-batch price (same lesson as the streaming mux)."""
        self.pipeline = pipeline
        self._run_in = run_in or (lambda fn: fn())
        super().__init__(max_batch=max_batch, linger_s=linger_s)

    #: served-request counter under its domain name (base: items_served)
    @property
    def requests_served(self) -> int:
        return self.items_served

    # -- client API ----------------------------------------------------
    def submit(self, query: str, top_k=None, search_type=None,
               collection=None, rerank=None) -> Future:
        return self._submit(query, (top_k, search_type, collection, rerank))

    def query(self, query: str, **kw):
        return self.submit(query, **kw).result()

    # -- dispatch ----------------------------------------------------------
    def _run_batch(self, payloads: list, key: tuple):
        top_k, search_type, collection, rerank = key
        return self._run_in(lambda: self.pipeline.query_batch(
            payloads, top_k=top_k, search_type=search_type,
            collection=collection, rerank=rerank))
