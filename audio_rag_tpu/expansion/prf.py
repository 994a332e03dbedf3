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
from audio_rag_tpu.text.tokenizer import norm_tokens
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
        qwords = set(norm_tokens(query))
        n_docs, df = self._corpus_stats()
        # ANCHORED mining (measured on the eval sweep): only feedback
        # docs that lexically contain a corpus-rare query term can
        # contribute terms — such a doc is demonstrably about the
        # query's subject, while the rest of the feedback is dense-model
        # guesswork whose terms are pure query drift. Queries with <2
        # anchors get NO expansion: either they carry no rare term
        # (paraphrase-style — the dense path owns them) or exactly one
        # doc matches it (exact-identifier lookups, already precise).
        rare_q = {w for w in qwords
                  if 0 < df.get(w, n_docs) * 8 <= n_docs}
        anchors = [
            r for r in feedback
            if rare_q & set(norm_tokens(r.text))
        ]
        if len(anchors) < 2:
            return []
        scores: dict[str, float] = {}
        doc_freq: dict[str, int] = {}  # anchor-doc frequency per term
        for rank, r in enumerate(anchors):
            w_rank = 1.0 / (1.0 + rank)  # higher-ranked docs weigh more
            tf: dict[str, int] = {}
            for w in norm_tokens(r.text):
                if w not in qwords:
                    tf[w] = tf.get(w, 0) + 1
            for w, cnt in tf.items():
                idf = math.log((n_docs + 1) / (1 + df.get(w, 0)))
                scores[w] = scores.get(w, 0.0) + w_rank * cnt * idf
                doc_freq[w] = doc_freq.get(w, 0) + 1
        # a term must recur across ≥2 anchors (single-doc terms are that
        # one doc's identifiers/noise), be corpus-rare itself (df ≤ N/8;
        # common terms are function-word-like), and score within 2× of
        # the best survivor
        ranked = sorted(
            ((s, w) for w, s in scores.items()
             if doc_freq[w] >= 2 and 8 * df.get(w, 0) <= n_docs),
            key=lambda sw: (-sw[0], sw[1]),
        )
        if not ranked:
            return []
        floor = ranked[0][0] * 0.5
        return [w for s, w in ranked[: self.config.prf_terms]
                if s > 0 and s >= floor]

    def _corpus_stats(self) -> tuple[int, dict[str, int]]:
        stats = getattr(self.retriever, "term_stats", None)
        if callable(stats):
            try:
                return stats(self.collection)
            except Exception:  # pragma: no cover - stats are best-effort
                pass
        return 1, {}
