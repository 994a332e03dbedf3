"""Multi-device vector store: rows shard over the 8-device CPU mesh and
search results must match the replicated single-device path exactly."""

import jax
import numpy as np
import pytest

from audio_rag_tpu.config.schema import RetrievalConfig
from audio_rag_tpu.core.types import AudioChunk, EmbeddingResult, SparseVector
from audio_rag_tpu.retrieval.tpu_store import TPUVectorStore


@pytest.fixture
def corpus():
    rng = np.random.default_rng(0)
    chunks, embs = [], []
    for i in range(300):
        chunks.append(AudioChunk(f"c{i}", float(i), float(i + 1),
                                 chunk_id=f"c{i}"))
        embs.append(EmbeddingResult(
            dense=rng.standard_normal(32).astype(np.float32),
            sparse=SparseVector([i % 50], [1.0]),
        ))
    return chunks, embs


def test_rows_shard_over_data_axis(corpus):
    assert len(jax.devices()) == 8, "conftest must provide the CPU mesh"
    # capacity_step 128 is NOT divisible evenly? 128 % 8 == 0 → fine
    store = TPUVectorStore(RetrievalConfig(capacity_step=128))
    chunks, embs = corpus
    store.add(chunks, embs)
    dev = store._coll(None).device_arrays()
    shardings = {k: v.sharding for k, v in dev.items()}
    # dense rows split over 'data'
    spec = getattr(shardings["dense"], "spec", None)
    assert spec is not None and spec[0] == "data"


def test_sharded_results_match_reference(corpus):
    store = TPUVectorStore(RetrievalConfig(capacity_step=128))
    chunks, embs = corpus
    store.add(chunks, embs)
    q = EmbeddingResult(dense=embs[42].dense,
                        sparse=SparseVector([42 % 50], [1.0]))
    got = store.search(q, top_k=10, search_type="hybrid")
    assert got[0].chunk_id is not None
    # numpy reference for the dense ranking
    mat = np.stack([e.dense / np.linalg.norm(e.dense) for e in embs])
    qv = q.dense / np.linalg.norm(q.dense)
    dense_ref = np.argsort(-(mat @ qv))[:10]
    got_dense = store.search(q, top_k=10, search_type="dense")
    assert [int(r.chunk_id[1:]) for r in got_dense] == dense_ref.tolist()
