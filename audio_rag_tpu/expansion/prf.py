"""Pseudo-relevance-feedback query expansion (RM3-style).

The reference's only expansion backend is HyDE (``expansion/hyde.py:21-123``)
— an LLM writes a hypothetical answer passage whose embedding replaces the
query's. PRF is the classic non-neural relative: run the raw query once,
mine the top feedback documents for tf·idf-salient terms the query lacks,
and append them. It attacks the same failure mode (query↔document
vocabulary mismatch) with zero model cost and one extra retrieval hop, and
— unlike HyDE, which needs trained LLM weights to produce anything
meaningful — its quality effect is measurable on the committed eval sweep
(``docs/FIDELITY.md`` §4's ``mismatch`` queries).

Term scoring: score(w) = Σ_docs rank_weight·tf_doc(w) · log((N+1)/(1+df(w)))
with corpus-level document frequency from the store's lexical stats
(:meth:`TPUVectorStore.term_stats`), so corpus-wide filler never beats the
rare topical bridge terms that make expansion useful.
"""

from __future__ import annotations

import math

from audio_rag_tpu.config.schema import ExpansionConfig
from audio_rag_tpu.utils.logging import get_logger

log = get_logger(__name__)

__all__ = ["PRFExpander"]


class PRFExpander:
    """Drop-in for :class:`HyDEExpander` (same ``expand``/``expand_single``
    surface) backed by the retriever instead of a generator."""

    def __init__(self, config: ExpansionConfig | None, embedder, retriever,
                 collection: str | None = None):
        self.config = config or ExpansionConfig()
        self.embedder = embedder
        self.retriever = retriever
        self.collection = collection

    def is_available(self) -> bool:
        return self.embedder is not None and self.retriever is not None

    def expand(self, query: str) -> list[str]:
        return [self.expand_single(query)]

    def expand_single(self, query: str) -> str:
        if not self.is_available():
            return query
        try:
            emb = self.embedder.embed_query(query)
            fb = self.retriever.search(
                emb, top_k=self.config.prf_depth, search_type="hybrid",
                collection=self.collection,
            )
        except Exception as exc:  # degrade to the raw query, HyDE-style
            log.warning("PRF first-pass failed: %s", exc)
            return query
        if not fb:
            return query
        terms = self._rm3_terms(query, fb)
        return f"{query} {' '.join(terms)}" if terms else query

    def _rm3_terms(self, query: str, feedback: list) -> list[str]:
        qwords = set(query.lower().split())
        n_docs, df = self._corpus_stats()
        scores: dict[str, float] = {}
        for rank, r in enumerate(feedback):
            w_rank = 1.0 / (1.0 + rank)  # higher-ranked docs weigh more
            tf: dict[str, int] = {}
            for w in r.text.lower().split():
                if w not in qwords:
                    tf[w] = tf.get(w, 0) + 1
            for w, cnt in tf.items():
                idf = math.log((n_docs + 1) / (1 + df.get(w, 0)))
                scores[w] = scores.get(w, 0.0) + w_rank * cnt * idf
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
        return [w for w, s in ranked[: self.config.prf_terms] if s > 0]

    def _corpus_stats(self) -> tuple[int, dict[str, int]]:
        stats = getattr(self.retriever, "term_stats", None)
        if callable(stats):
            try:
                return stats(self.collection)
            except Exception:  # pragma: no cover - stats are best-effort
                pass
        return 1, {}
