"""Fused query path vs store path: sparse rankings must agree, including
queries with repeated tokens (max-pool dedup semantics)."""

import numpy as np
import pytest

from audio_rag_tpu.config.schema import (
    EmbeddingConfig,
    RerankingConfig,
    RetrievalConfig,
)
from audio_rag_tpu.core.types import AudioChunk
from audio_rag_tpu.embeddings.bge import BGEM3Embedder
from audio_rag_tpu.engine.query_engine import QueryEngine
from audio_rag_tpu.retrieval.tpu_store import TPUVectorStore


@pytest.fixture(scope="module")
def setup():
    emb = BGEM3Embedder(EmbeddingConfig(model="test"))
    emb.load()
    store = TPUVectorStore(RetrievalConfig(capacity_step=128))
    texts = [
        f"document about topic{i} covering concept{i % 5} in detail"
        for i in range(40)
    ]
    chunks = [AudioChunk(t, float(i), float(i + 30), chunk_id=f"c{i}")
              for i, t in enumerate(texts)]
    store.add(chunks, emb.embed(texts))
    return emb, store


@pytest.mark.parametrize("query", [
    "topic7 and concept2",
    "topic7 topic7 topic7 concept2",  # repeated tokens exercise the dedup
])
@pytest.mark.parametrize("stype", ["dense", "hybrid", "sparse"])
def test_fused_matches_store(setup, query, stype):
    emb, store = setup
    engine = QueryEngine(emb, store, reranker=None)
    fused = engine.query_batch([query], top_k=5, search_type=stype,
                               rerank=False)[0]
    q = emb.embed_query(query)
    direct = store.search(q, top_k=5, search_type=stype)
    assert [r.chunk_id for r in fused] == [r.chunk_id for r in direct]
    np.testing.assert_allclose(
        [r.score for r in fused], [r.score for r in direct], rtol=2e-3,
        atol=1e-4,
    )
