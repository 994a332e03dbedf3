"""Single-program query path (embed→search→rerank in ONE dispatch) vs the
two-program path: rankings and cross-encoder scores must agree, the rerank
pool must honor initial_k, and the device-side rerank token cache must track
an append-only collection."""

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
from audio_rag_tpu.reranking.bge import BGEReranker
from audio_rag_tpu.retrieval.tpu_store import TPUVectorStore


def _texts(n, offset=0):
    return [
        f"passage about subject{i + offset} discussing aspect{(i + offset) % 7} "
        f"with extra detail{i + offset}"
        for i in range(n)
    ]


@pytest.fixture(scope="module")
def setup():
    emb = BGEM3Embedder(EmbeddingConfig(model="test"))
    emb.load()
    rr = BGEReranker(RerankingConfig(model="test", fused_doc_tokens=32))
    rr.load()
    store = TPUVectorStore(RetrievalConfig(capacity_step=128))
    texts = _texts(30)
    chunks = [AudioChunk(t, float(i), float(i + 30), chunk_id=f"c{i}")
              for i, t in enumerate(texts)]
    store.add(chunks, emb.embed(texts))
    return emb, rr, store


def _host_path(engine, monkeypatch, queries, **kw):
    """Force the two-program fallback (host-tokenized rerank pairs)."""

    def boom(*a, **k):
        raise RuntimeError("forced fallback")

    with monkeypatch.context() as m:
        m.setattr(engine, "_query_device_rerank", boom)
        return engine.query_batch(queries, **kw)


@pytest.mark.parametrize("stype", ["dense", "hybrid"])
def test_device_rerank_matches_host_path(setup, monkeypatch, stype):
    emb, rr, store = setup
    engine = QueryEngine(emb, store, reranker=rr)
    queries = ["subject7 aspect3", "detail11 subject11"]
    dev = engine.query_batch(queries, top_k=5, search_type=stype)
    host = _host_path(engine, monkeypatch, queries, top_k=5,
                      search_type=stype)
    for d_row, h_row in zip(dev, host):
        assert [r.chunk_id for r in d_row] == [r.chunk_id for r in h_row]
        np.testing.assert_allclose(
            [r.score for r in d_row], [r.score for r in h_row],
            rtol=2e-2, atol=2e-3,
        )


def test_device_rerank_pool_respects_initial_k(setup):
    emb, rr, store = setup
    engine = QueryEngine(emb, store, reranker=rr)
    q = "subject3 aspect5"
    # the rerank pool is exactly the top-initial_k search candidates
    unranked = engine.query_batch([q], top_k=4, rerank=False,
                                  initial_k=4)[0]
    pool = {r.chunk_id for r in unranked}
    reranked = engine.query_batch([q], top_k=4, initial_k=4)[0]
    assert {r.chunk_id for r in reranked} == pool


def test_rerank_cache_tracks_appends(setup, monkeypatch):
    emb, rr, store = setup
    engine = QueryEngine(emb, store, reranker=rr)
    coll_name = "growing"
    texts = _texts(6)
    chunks = [AudioChunk(t, float(i), float(i + 30), chunk_id=f"g{i}")
              for i, t in enumerate(texts)]
    store.add(chunks, emb.embed(texts), collection=coll_name)
    engine.collection = coll_name
    out1 = engine.query_batch(["subject2"], top_k=3)[0]
    assert out1
    # append a uniquely-worded doc: the incremental cache extension must
    # produce the SAME cross-encoder scores as host-side pair tokenization
    # (a stale/empty cached row would score differently)
    extra = ["unmistakable zanzibar lighthouse chronicle"]
    store.add(
        [AudioChunk(extra[0], 0.0, 30.0, chunk_id="gx")],
        emb.embed(extra), collection=coll_name,
    )
    q = ["unmistakable zanzibar lighthouse"]
    dev = engine.query_batch(q, top_k=7, search_type="sparse")[0]
    host = _host_path(engine, monkeypatch, q, top_k=7,
                      search_type="sparse")[0]
    assert "gx" in [r.chunk_id for r in dev]
    assert [r.chunk_id for r in dev] == [r.chunk_id for r in host]
    np.testing.assert_allclose(
        [r.score for r in dev], [r.score for r in host],
        rtol=2e-2, atol=2e-3,
    )


def test_recreated_collection_invalidates_cache(setup):
    emb, rr, store = setup
    engine = QueryEngine(emb, store, reranker=rr)
    name = "recreated"
    for generation in range(2):
        texts = [f"generation{generation} marker doc {i}" for i in range(4)]
        chunks = [AudioChunk(t, 0.0, 30.0, chunk_id=f"r{generation}_{i}")
                  for i, t in enumerate(texts)]
        store.delete_collection(name)
        store.add(chunks, emb.embed(texts), collection=name)
        engine.collection = name
        out = engine.query_batch([f"generation{generation} marker"],
                                 top_k=2)[0]
        assert all(r.chunk_id.startswith(f"r{generation}_") for r in out)
