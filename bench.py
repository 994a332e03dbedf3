"""Headline benchmark: hybrid search + cross-encoder rerank QPS, single-stream.

Reference baseline (BASELINE.md): 7.1 QPS at 141 ms p50 for search+rerank on
a single GPU (embed 18 ms + hybrid search 48 ms + rerank 38 ms, three
separate serving stacks). Here the same pipeline — BGE-M3 embed (XLM-R-large
architecture), HBM-resident hybrid search with RRF fusion, BGE cross-encoder
rerank (XLM-R-base) — runs as three fused XLA programs on one TPU chip.

Weights are random-init (zero-egress environment): identical FLOPs/memory
traffic to trained weights, so latency/throughput are representative.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

BASELINE_QPS = 7.1  # reference search+rerank throughput (BASELINE.md)

CORPUS_SIZE = 10_000
N_WARMUP = 3
N_QUERIES = 30


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def build_corpus(store, embedder, rng):
    """Synthetic corpus with realistic chunk text + real embedder vectors for
    a few hundred rows, dense-filled to CORPUS_SIZE with random vectors."""
    from audio_rag_tpu.core.types import AudioChunk, EmbeddingResult, SparseVector

    words = [f"term{i}" for i in range(2000)]
    texts = [
        " ".join(rng.choice(words, size=40).tolist()) for _ in range(64)
    ]
    real = embedder.embed(texts)
    dim = real[0].dim

    chunks, embs = [], []
    for i in range(CORPUS_SIZE):
        if i < len(real):
            emb = real[i]
            text = texts[i]
        else:
            dense = rng.standard_normal(dim).astype(np.float32)
            ids = np.unique(rng.integers(4, 30_000, size=60)).astype(np.int32)
            emb = EmbeddingResult(
                dense=dense,
                sparse=SparseVector(ids, rng.random(ids.size).astype(np.float32)),
            )
            text = " ".join(rng.choice(words, size=40).tolist())
        chunks.append(
            AudioChunk(
                text=text, start=float(i), end=float(i + 30),
                speaker=f"SPEAKER_{i % 4:02d}", chunk_id=f"c{i}",
            )
        )
        embs.append(emb)
    store.add(chunks, embs)
    log(f"corpus: {store.count()} chunks, dim {dim}")


def main() -> None:
    t_setup = time.time()
    from audio_rag_tpu.config.schema import (
        EmbeddingConfig,
        RerankingConfig,
        RetrievalConfig,
    )
    from audio_rag_tpu.embeddings.bge import BGEM3Embedder
    from audio_rag_tpu.reranking.bge import BGEReranker
    from audio_rag_tpu.retrieval.tpu_store import TPUVectorStore

    import jax

    from audio_rag_tpu.utils.jax_cache import enable_compilation_cache

    enable_compilation_cache()
    log(f"devices: {jax.devices()}")
    rng = np.random.default_rng(0)

    embedder = BGEM3Embedder(EmbeddingConfig())
    embedder.load()
    reranker = BGEReranker(RerankingConfig())
    reranker.load()
    store = TPUVectorStore(RetrievalConfig(capacity_step=4096))
    build_corpus(store, embedder, rng)
    log(f"setup {time.time() - t_setup:.1f}s")

    queries = [
        f"what is term{i} and how does term{i + 7} relate to term{i + 19}"
        for i in range(N_WARMUP + N_QUERIES)
    ]

    def run_query(q: str):
        emb = embedder.embed_query(q)
        hits = store.search(emb, top_k=20, search_type="hybrid")
        return reranker.rerank(q, hits, top_k=5)

    # warmup (compiles all three programs)
    for q in queries[:N_WARMUP]:
        r = run_query(q)
        assert len(r) == 5, f"expected 5 results, got {len(r)}"
    log("warmup done")

    lat = []
    t0 = time.perf_counter()
    for q in queries[N_WARMUP:]:
        t1 = time.perf_counter()
        run_query(q)
        lat.append(time.perf_counter() - t1)
    total = time.perf_counter() - t0

    qps = len(lat) / total
    p50 = float(np.percentile(lat, 50) * 1000)
    p95 = float(np.percentile(lat, 95) * 1000)
    log(f"qps={qps:.2f} p50={p50:.1f}ms p95={p95:.1f}ms")

    print(json.dumps({
        "metric": "hybrid_search_rerank_qps",
        "value": round(qps, 2),
        "unit": "qps",
        "vs_baseline": round(qps / BASELINE_QPS, 2),
        "extra": {
            "p50_ms": round(p50, 1),
            "p95_ms": round(p95, 1),
            "baseline_qps": BASELINE_QPS,
            "baseline_p50_ms": 141,
            "corpus_size": CORPUS_SIZE,
            "note": "single-stream; BGE-M3 embed + hybrid RRF search + "
                    "cross-encoder rerank(20->5); random-init weights "
                    "(identical FLOPs to trained)",
        },
    }))


if __name__ == "__main__":
    main()
