"""Deterministic fake reranker: scores by word-overlap with the query."""

from __future__ import annotations

from audio_rag_tpu.config.schema import RerankingConfig
from audio_rag_tpu.core.base import BaseReranker
from audio_rag_tpu.core.types import RetrievalResult
from audio_rag_tpu.reranking.base import RerankerRegistry
from audio_rag_tpu.text.tokenizer import HashWordTokenizer

__all__ = ["FakeReranker"]


@RerankerRegistry.register("fake")
class FakeReranker(BaseReranker):
    hbm_required_gb = 0.0

    def __init__(self, config: RerankingConfig | None = None):
        super().__init__()
        self.config = config or RerankingConfig()
        self._tok = HashWordTokenizer()
        self._loaded = True

    def rerank(
        self, query: str, results: list[RetrievalResult], top_k: int | None = None
    ) -> list[RetrievalResult]:
        k = top_k or self.config.top_k
        if len(results) <= k:
            return results
        q = set(self._tok.tokenize_words(query))
        scored = []
        for r in results:
            d = set(self._tok.tokenize_words(r.text))
            overlap = len(q & d) / max(len(q), 1)
            scored.append(
                RetrievalResult(
                    text=r.text, score=overlap, start=r.start, end=r.end,
                    speaker=r.speaker, chunk_id=r.chunk_id, metadata=r.metadata,
                )
            )
        scored.sort(key=lambda r: -r.score)
        return scored[:k]
