"""int8-quantized dense corpus: 4x smaller, rankings preserved."""

import numpy as np
import pytest

from audio_rag_tpu.config.schema import RetrievalConfig
from audio_rag_tpu.core.types import AudioChunk, EmbeddingResult, SparseVector
from audio_rag_tpu.retrieval.tpu_store import TPUVectorStore


def corpus(n=200, dim=64, seed=0):
    rng = np.random.default_rng(seed)
    chunks, embs = [], []
    for i in range(n):
        chunks.append(AudioChunk(f"doc {i}", float(i), float(i + 1),
                                 chunk_id=f"c{i}"))
        embs.append(EmbeddingResult(
            dense=rng.standard_normal(dim).astype(np.float32),
            sparse=SparseVector([i % 40], [1.0]),
        ))
    return chunks, embs


@pytest.fixture
def stores():
    cfg_q = RetrievalConfig(capacity_step=128, quantize_dense=True)
    cfg_f = RetrievalConfig(capacity_step=128, quantize_dense=False)
    sq, sf = TPUVectorStore(cfg_q), TPUVectorStore(cfg_f)
    chunks, embs = corpus()
    sq.add(chunks, embs)
    sf.add(chunks, embs)
    return sq, sf, embs


def test_int8_arrays_on_device(stores):
    sq, _, _ = stores
    dev = sq._coll(None).device_arrays()
    assert str(dev["dense"].dtype) == "int8"
    assert "scales" in dev
    # 4x memory: int8 vs f32
    assert dev["dense"].nbytes * 4 == np.prod(dev["dense"].shape) * 4


def test_rankings_match_fp32(stores):
    sq, sf, embs = stores
    agree_top1 = 0
    for qi in (3, 57, 123, 180):
        q = EmbeddingResult(dense=embs[qi].dense)
        rq = sq.search(q, top_k=10, search_type="dense")
        rf = sf.search(q, top_k=10, search_type="dense")
        assert rq[0].chunk_id == rf[0].chunk_id  # top-1 identical
        ids_q = {r.chunk_id for r in rq}
        ids_f = {r.chunk_id for r in rf}
        assert len(ids_q & ids_f) >= 8  # top-10 overlap ≥ 80%
        agree_top1 += 1
    assert agree_top1 == 4


def test_scores_close(stores):
    sq, sf, embs = stores
    q = EmbeddingResult(dense=embs[7].dense)
    sq_top = sq.search(q, top_k=1, search_type="dense")[0]
    sf_top = sf.search(q, top_k=1, search_type="dense")[0]
    assert sq_top.score == pytest.approx(sf_top.score, abs=0.02)


def test_hybrid_with_quantized_dense(stores):
    sq, _, embs = stores
    q = EmbeddingResult(dense=embs[11].dense,
                        sparse=SparseVector([11 % 40], [1.0]))
    res = sq.search(q, top_k=5, search_type="hybrid")
    assert res and res[0].score > 0
