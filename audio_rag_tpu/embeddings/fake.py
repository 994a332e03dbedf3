"""Deterministic lexical fake embedder.

Dense vector = L2-normalized bag-of-words over per-word stable random
projections (seeded by a word hash), sparse = word-count lexical weights.
Equal words embed identically across processes, so dense cosine similarity
reflects lexical overlap — retrieval and eval pipelines behave meaningfully
without model weights (the fake-backend strategy SURVEY.md §4 calls for).
"""

from __future__ import annotations

import hashlib

import numpy as np

from audio_rag_tpu.config.schema import EmbeddingConfig
from audio_rag_tpu.core.base import BaseEmbedder
from audio_rag_tpu.core.types import EmbeddingResult, SparseVector
from audio_rag_tpu.embeddings.base import EmbeddingsRegistry
from audio_rag_tpu.text.tokenizer import HashWordTokenizer

__all__ = ["FakeEmbedder"]


@EmbeddingsRegistry.register("fake")
class FakeEmbedder(BaseEmbedder):
    hbm_required_gb = 0.0

    def __init__(self, config: EmbeddingConfig | None = None, dim: int = 256):
        super().__init__()
        self.config = config or EmbeddingConfig()
        self.dim = dim
        self._tok = HashWordTokenizer()
        self._word_vecs: dict[str, np.ndarray] = {}
        self._loaded = True

    def _vec(self, word: str) -> np.ndarray:
        v = self._word_vecs.get(word)
        if v is None:
            seed = int.from_bytes(
                hashlib.blake2s(word.encode(), digest_size=4).digest(), "little"
            )
            v = np.random.default_rng(seed).standard_normal(self.dim)
            v = (v / np.linalg.norm(v)).astype(np.float32)
            self._word_vecs[word] = v
        return v

    def embed(self, texts: list[str]) -> list[EmbeddingResult]:
        out = []
        for text in texts:
            words = self._tok.tokenize_words(text)
            if words:
                dense = np.sum([self._vec(w) for w in words], axis=0)
                n = np.linalg.norm(dense)
                dense = (dense / n if n > 0 else dense).astype(np.float32)
            else:
                dense = np.zeros(self.dim, np.float32)
            sparse = None
            if self.config.use_sparse:
                counts: dict[int, float] = {}
                for w in words:
                    wid = self._tok._word_id(w)
                    counts[wid] = counts.get(wid, 0.0) + 1.0
                sparse = SparseVector.from_dict(counts)
            out.append(EmbeddingResult(dense=dense, sparse=sparse, text=text))
        return out
