"""Discriminating retrieval-quality sweep.

Runs the synthetic 240-chunk corpus (:mod:`audio_rag_tpu.evaluation.corpus`)
through the production :class:`~audio_rag_tpu.engine.query_engine.QueryEngine`
under each retrieval config — dense, hybrid, hybrid+rerank — with the
committed *trained* tiny models (``embeddings`` model ``eval-small``,
``reranking`` model ``eval-small``; trained by ``scripts/train_retrieval.py``).

This is the quality-parity gate's measuring instrument: the reference's
published sweep separates (P@5 0.425 dense → 0.625 hybrid+contextual →
0.675 +HyDE, reference ``README.md:30-31``); a 24-chunk corpus with
random-init weights cannot reproduce *any* separation (round-2 verdict:
dense ≡ hybrid ≡ 0.792, hit rate 1.0). Here the corpus is 12× ``initial_k``
and the models are trained, so each stage's mechanism is measurable and a
ranking-quality regression moves the numbers.

Used by ``scripts/eval_quality.py`` (prints the table for docs/FIDELITY.md)
and ``tests/unit/evaluation/test_quality_separation.py`` (asserts the
separation ordering holds).
"""

from __future__ import annotations

from typing import Any

from audio_rag_tpu.evaluation.corpus import SynthCorpus, make_corpus
from audio_rag_tpu.evaluation.dataset import EvalDataset

__all__ = ["build_eval_engine", "run_quality_sweep", "SWEEP_CONFIGS"]

#: (label, search_type, rerank)
SWEEP_CONFIGS = [
    ("dense", "dense", False),
    ("sparse", "sparse", False),
    ("hybrid", "hybrid", False),
    ("hybrid+rerank", "hybrid", True),
]


def build_eval_engine(corpus: SynthCorpus | None = None):
    """(engine, corpus): the production fused QueryEngine over the synthetic
    corpus with the trained tiny retrieval models."""
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

    corpus = corpus or make_corpus()
    emb = BGEM3Embedder(EmbeddingConfig(model="eval-small"))
    emb.load()
    rr = BGEReranker(RerankingConfig(model="eval-small",
                                     fused_doc_tokens=32))
    rr.load()
    store = TPUVectorStore(RetrievalConfig(capacity_step=256))
    chunks = [
        AudioChunk(t, float(i) * 30.0, float(i + 1) * 30.0,
                   speaker=f"SPEAKER_{i % 2:02d}", chunk_id=f"c{i:03d}")
        for i, t in enumerate(corpus.chunks)
    ]
    store.add(chunks, emb.embed(corpus.chunks))
    return QueryEngine(emb, store, rr), corpus


def run_quality_sweep(
    engine=None,
    eval_set: EvalDataset | None = None,
    top_k: int = 5,
    initial_k: int = 20,
) -> dict[str, Any]:
    """metrics per config: overall + per query type (paraphrase/tag/pair).

    Returns ``{config: {"p_at_5": .., "mrr": .., "ndcg": .., "hit_rate": ..,
    "by_type": {type: {...}}}}``.
    """
    from audio_rag_tpu.evaluation.metrics import RAGEvaluator

    if engine is None:
        engine, corpus = build_eval_engine()
        eval_set = eval_set or corpus.eval_set
    assert eval_set is not None
    evaluator = RAGEvaluator(k=top_k)
    queries = [s.question for s in eval_set]

    out: dict[str, Any] = {}
    for label, stype, rerank in SWEEP_CONFIGS:
        rows = engine.query_batch(
            queries, top_k=top_k, search_type=stype,
            initial_k=initial_k, rerank=rerank,
        )
        per_sample = []
        for sample, results in zip(eval_set, rows):
            m = evaluator.compute_retrieval_metrics(
                results, sample.relevance_keywords, k=top_k)
            per_sample.append((sample.metadata.get("type", "?"), m))

        def agg(ms):
            n = max(len(ms), 1)
            return {
                "p_at_5": round(sum(m.precision_at_k for m in ms) / n, 4),
                "mrr": round(sum(m.mrr for m in ms) / n, 4),
                "ndcg": round(sum(m.ndcg for m in ms) / n, 4),
                "hit_rate": round(sum(m.hit_rate for m in ms) / n, 4),
            }

        by_type = {}
        for t in sorted({t for t, _ in per_sample}):
            by_type[t] = agg([m for tt, m in per_sample if tt == t])
        out[label] = {**agg([m for _, m in per_sample]), "by_type": by_type}
    return out
