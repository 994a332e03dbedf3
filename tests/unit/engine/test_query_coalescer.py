"""QueryCoalescer: concurrent search requests share fused device batches
with per-query results identical to the single-query path."""

import threading

import numpy as np
import pytest

from audio_rag_tpu.config.schema import AudioRAGConfig
from audio_rag_tpu.engine.query_coalescer import QueryCoalescer
from audio_rag_tpu.pipeline.orchestrator import AudioRAG


@pytest.fixture(scope="module")
def rag():
    rag = AudioRAG(AudioRAGConfig(**{
        "asr": {"backend": "fake"},
        "diarization": {"backend": "fake"},
        "embedding": {"backend": "fake"},
        "retrieval": {"backend": "tpu", "capacity_step": 128},
        "reranking": {"backend": "fake"},
        "generation": {"backend": "none"},
    }))
    audio = np.sin(np.linspace(0, 440 * 2 * np.pi * 5, 16000 * 5)).astype(
        np.float32)
    rag.ingest(audio, 16000)
    return rag


QUERIES = [f"word{i} word{i + 1}" for i in range(12)]


class TestCoalescer:
    def test_results_match_single_query_path(self, rag):
        expected = {
            q: [r.chunk_id for r in
                rag.query(q, rerank=False, top_k=3).results]
            for q in QUERIES
        }
        c = QueryCoalescer(rag.querying)
        try:
            # hold the worker behind a slow first batch so later submits
            # genuinely accumulate into one batch
            futures = [c.submit(q, rerank=False, top_k=3) for q in QUERIES]
            got = {q: [r.chunk_id for r in f.result(timeout=60).results]
                   for q, f in zip(QUERIES, futures)}
        finally:
            c.stop()
        assert got == expected
        assert c.requests_served == len(QUERIES)
        assert c.batches_run <= len(QUERIES)

    def test_concurrent_submits_coalesce(self, rag):
        c = QueryCoalescer(rag.querying)
        results = {}
        try:
            def worker(q):
                results[q] = c.query(q, rerank=False, top_k=3)

            threads = [threading.Thread(target=worker, args=(q,))
                       for q in QUERIES]
            for t in threads:
                t.start()
            for t in threads:
                t.join(timeout=60)
        finally:
            c.stop()
        assert len(results) == len(QUERIES)
        assert all(r.results for r in results.values())
        # at least SOME coalescing happened under 12-way concurrency
        assert c.batches_run < c.requests_served

    def test_mixed_keys_still_all_served(self, rag):
        c = QueryCoalescer(rag.querying)
        try:
            futs = [
                c.submit(QUERIES[i], rerank=False,
                         top_k=3 if i % 2 == 0 else 5)
                for i in range(8)
            ]
            outs = [f.result(timeout=60) for f in futs]
        finally:
            c.stop()
        assert len(outs) == 8
        for i, out in enumerate(outs):
            assert len(out.results) <= (3 if i % 2 == 0 else 5)

    def test_error_propagates_to_batch(self, rag):
        c = QueryCoalescer(rag.querying)
        orig = rag.querying.query_batch
        try:
            rag.querying.query_batch = lambda *a, **k: (_ for _ in ()).throw(
                RuntimeError("device boom"))
            with pytest.raises(RuntimeError, match="device boom"):
                c.query("word0", rerank=False)
        finally:
            rag.querying.query_batch = orig
            c.stop()
