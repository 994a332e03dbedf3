"""Discriminating retrieval-quality sweep.

Runs the synthetic corpus (:mod:`audio_rag_tpu.evaluation.corpus`) through
the production :class:`~audio_rag_tpu.engine.query_engine.QueryEngine`
under each retrieval config — dense, hybrid, hybrid+rerank, contextual
headers on, and PRF query expansion — with the committed *trained* tiny
models (``embeddings`` model ``eval-small``, ``reranking`` model
``eval-small``; trained by ``scripts/train_retrieval.py``).

This is the quality-parity gate's measuring instrument: the reference's
published sweep separates across the same ladder (P@5 0.425 dense → 0.625
hybrid+contextual → 0.675 +HyDE, reference ``README.md:30-31``); a
24-chunk corpus with random-init weights cannot reproduce *any* separation
(round-2 verdict: dense ≡ hybrid ≡ 0.792, hit rate 1.0). Here the corpus
is ≫ ``initial_k``, the models are trained, and every pipeline stage —
including the contextual and expansion stages the reference ladder
measures — has query types that isolate its mechanism, so a
ranking-quality regression in any stage moves the numbers.

Used by ``scripts/eval_quality.py`` (prints the table for docs/FIDELITY.md)
and ``tests/unit/evaluation/test_quality_separation.py`` (asserts the
separation orderings hold).
"""

from __future__ import annotations

import dataclasses
from typing import Any

from audio_rag_tpu.evaluation.corpus import (
    SynthCorpus,
    extend_corpus,
    make_corpus,
)

__all__ = ["build_eval_setup", "build_eval_setup_audio",
           "transcribe_corpus", "run_quality_sweep", "SWEEP_CONFIGS"]

#: (label, search_type, rerank, store, prf)
SWEEP_CONFIGS = [
    ("dense", "dense", False, "base", False),
    ("sparse", "sparse", False, "base", False),
    ("hybrid", "hybrid", False, "base", False),
    ("hybrid+rerank", "hybrid", True, "base", False),
    # the reference ladder's upper rows: contextual headers change what
    # is EMBEDDED (store side); expansion changes what is SEARCHED
    # (query side, PRF standing in for HyDE — no trained LLM exists)
    ("hybrid+context", "hybrid", False, "ctx", False),
    ("hybrid+context+prf", "hybrid", False, "ctx", True),
]


def _make_chunks(texts: list[str]) -> list:
    from audio_rag_tpu.core.types import AudioChunk

    return [
        AudioChunk(t, float(i) * 30.0, float(i + 1) * 30.0,
                   speaker=f"SPEAKER_{i % 2:02d}", chunk_id=f"c{i:03d}")
        for i, t in enumerate(texts)
    ]


def build_eval_setup(corpus: SynthCorpus | None = None):
    """(engines, corpus): ``engines`` maps store flavor → fused
    QueryEngine — ``base`` embeds the raw chunks, ``ctx`` embeds them
    after the production extractive contextual stage ran per recording
    (``corpus.doc_groups``). Both share one trained embedder/reranker."""
    from audio_rag_tpu.config.schema import (
        ContextualConfig,
        EmbeddingConfig,
        RerankingConfig,
        RetrievalConfig,
    )
    from audio_rag_tpu.contextual.processor import ContextualProcessor
    from audio_rag_tpu.embeddings.bge import BGEM3Embedder
    from audio_rag_tpu.engine.query_engine import QueryEngine
    from audio_rag_tpu.reranking.bge import BGEReranker
    from audio_rag_tpu.retrieval.tpu_store import TPUVectorStore

    corpus = corpus or extend_corpus(make_corpus())
    emb = BGEM3Embedder(EmbeddingConfig(model="eval-small"))
    emb.load()
    rr = BGEReranker(RerankingConfig(model="eval-small",
                                     fused_doc_tokens=32))
    rr.load()

    engines: dict[str, QueryEngine] = {}
    base_chunks = _make_chunks(corpus.chunks)
    store = TPUVectorStore(RetrievalConfig(capacity_step=256))
    store.add(base_chunks, emb.embed(corpus.chunks))
    engines["base"] = QueryEngine(emb, store, rr)

    proc = ContextualProcessor(ContextualConfig(
        enabled=True, backend="extractive", window_size=1))
    groups = corpus.doc_groups or [(0, len(corpus.chunks))]
    ctx_chunks = []
    for a, b in groups:
        ctx_chunks.extend(proc.process_chunks(base_chunks[a:b]))
    ctx_store = TPUVectorStore(RetrievalConfig(capacity_step=256))
    ctx_store.add(ctx_chunks, emb.embed([c.text for c in ctx_chunks]))
    engines["ctx"] = QueryEngine(emb, ctx_store, rr)
    return engines, corpus


# -- audio-in variant: the corpus is SPOKEN and transcribed ----------------

def transcribe_corpus(texts: list[str], asr=None, seed: int = 4242,
                      noise_level: float = 0.01) -> list[str]:
    """Speak each text in the synthetic charvoice and transcribe it with
    the committed TRAINED tiny ASR through the product transcribe path
    (6 s windowing → mel → batched greedy decode → char codec).

    Returns the hypothesis texts (what the index will embed)."""
    import numpy as np

    from audio_rag_tpu.audio.charvoice import SR, synth_text

    if asr is None:
        from audio_rag_tpu.asr.whisper_jax import WhisperJaxASR
        from audio_rag_tpu.config.schema import ASRConfig

        asr = WhisperJaxASR(ASRConfig(
            model_size="tiny-synth", compute_type="float32",
            vad_filter=False, temperature_fallback=False,
            window_batch_size=4,
        ))
    if not asr.is_loaded:
        asr.load()
    rng = np.random.default_rng(seed)
    hyps = []
    for text in texts:
        wav = synth_text(text, rng, noise_level=noise_level)
        segs = asr.transcribe(wav, SR)
        hyps.append(" ".join(s.text for s in segs))
    return hyps


def build_eval_setup_audio(corpus: SynthCorpus | None = None, asr=None):
    """Audio-in ladder setup: every corpus chunk goes speech → trained
    ASR → text before embedding, so the sweep measures retrieval quality
    ON REAL PIPELINE OUTPUT (transcription errors degrade the embeddings
    and rankings exactly as they would in production). Chunk boundaries
    stay 1:1 with the corpus and each hit carries
    ``metadata.original_text`` (the ground-truth text), so relevance
    judgment stays exact — ASR noise can only hurt the *ranking*, never
    corrupt the judge. (The align/chunk stages on audio are exercised by
    the ingest e2e tests; this harness isolates the speech→text→retrieve
    quality question.)"""
    from audio_rag_tpu.config.schema import (
        ContextualConfig,
        EmbeddingConfig,
        RerankingConfig,
        RetrievalConfig,
    )
    from audio_rag_tpu.contextual.processor import ContextualProcessor
    from audio_rag_tpu.core.types import AudioChunk
    from audio_rag_tpu.embeddings.bge import BGEM3Embedder
    from audio_rag_tpu.engine.query_engine import QueryEngine
    from audio_rag_tpu.reranking.bge import BGEReranker
    from audio_rag_tpu.retrieval.tpu_store import TPUVectorStore

    corpus = corpus or extend_corpus(make_corpus())
    hyps = transcribe_corpus(corpus.chunks, asr=asr)

    emb = BGEM3Embedder(EmbeddingConfig(model="eval-small"))
    emb.load()
    rr = BGEReranker(RerankingConfig(model="eval-small",
                                     fused_doc_tokens=32))
    rr.load()

    # ground truth rides under "gt_text": the contextual stage overwrites
    # "original_text" with the (transcribed) chunk text it wraps, but
    # merges existing metadata through — so gt_text survives both stores
    chunks = [
        AudioChunk(h, float(i) * 30.0, float(i + 1) * 30.0,
                   speaker=f"SPEAKER_{i % 2:02d}", chunk_id=f"c{i:03d}",
                   metadata={"gt_text": orig})
        for i, (h, orig) in enumerate(zip(hyps, corpus.chunks))
    ]
    engines: dict[str, QueryEngine] = {}
    store = TPUVectorStore(RetrievalConfig(capacity_step=256))
    store.add(chunks, emb.embed(hyps))
    engines["base"] = QueryEngine(emb, store, rr)

    proc = ContextualProcessor(ContextualConfig(
        enabled=True, backend="extractive", window_size=1))
    groups = corpus.doc_groups or [(0, len(chunks))]
    ctx_chunks = []
    for a, b in groups:
        ctx_chunks.extend(proc.process_chunks(chunks[a:b]))
    ctx_store = TPUVectorStore(RetrievalConfig(capacity_step=256))
    ctx_store.add(ctx_chunks, emb.embed([c.text for c in ctx_chunks]))
    engines["ctx"] = QueryEngine(emb, ctx_store, rr)
    return engines, corpus


def run_quality_sweep(
    engines=None,
    eval_set=None,
    top_k: int = 5,
    initial_k: int = 20,
) -> dict[str, Any]:
    """metrics per config: overall + per query type (paraphrase / tag /
    pair / context / mismatch).

    Returns ``{config: {"p_at_5": .., "mrr": .., "ndcg": .., "hit_rate":
    .., "by_type": {type: {...}}}}``. Relevance is judged on each hit's
    ORIGINAL text (``metadata.original_text``) so contextual headers
    can't satisfy a keyword by quoting a neighbour — headers may only
    help by improving the *ranking*.
    """
    from audio_rag_tpu.config.schema import ExpansionConfig
    from audio_rag_tpu.evaluation.metrics import RAGEvaluator
    from audio_rag_tpu.expansion.prf import PRFExpander

    if engines is None:
        engines, corpus = build_eval_setup()
        eval_set = eval_set or corpus.eval_set
    assert eval_set is not None
    evaluator = RAGEvaluator(k=top_k)
    queries = [s.question for s in eval_set]

    out: dict[str, Any] = {}
    for label, stype, rerank, flavor, prf in SWEEP_CONFIGS:
        engine = engines[flavor]
        qs = queries
        if prf:
            expander = PRFExpander(
                ExpansionConfig(backend="prf"), engine.embedder,
                engine.store)
            qs = [expander.expand_single(q) for q in queries]
        rows = engine.query_batch(
            qs, top_k=top_k, search_type=stype,
            initial_k=initial_k, rerank=rerank,
        )
        per_sample = []
        for sample, results in zip(eval_set, rows):
            results = [
                dataclasses.replace(
                    r, text=r.metadata.get(
                        "gt_text",
                        r.metadata.get("original_text", r.text)))
                for r in results
            ]
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
