"""Semantic chunker: split where adjacent-segment embedding similarity drops.

The reference's schema lists ``semantic`` as a chunking strategy
(``config/schema.py:36``) with no implementation; this provides one:
consecutive transcript segments embed (batched, one device call via the
configured embedder) and a chunk boundary opens where the cosine similarity
between neighbouring segments falls below ``threshold`` (relative to the
running chunk centroid), subject to the standard max/min token budgets.
"""

from __future__ import annotations

import uuid

import numpy as np

from audio_rag_tpu.chunking.base import ChunkingRegistry, estimate_tokens
from audio_rag_tpu.config.schema import ChunkingConfig
from audio_rag_tpu.core.base import BaseChunker
from audio_rag_tpu.core.types import AudioChunk, TranscriptSegment

__all__ = ["SemanticChunker"]


@ChunkingRegistry.register("semantic")
class SemanticChunker(BaseChunker):
    def __init__(
        self,
        config: ChunkingConfig | None = None,
        embedder=None,
        threshold: float = 0.55,
    ):
        self.config = config or ChunkingConfig()
        self.embedder = embedder
        self.threshold = threshold

    def _embedder(self):
        if self.embedder is None:
            from audio_rag_tpu.embeddings.fake import FakeEmbedder

            self.embedder = FakeEmbedder()
        if hasattr(self.embedder, "is_loaded") and not self.embedder.is_loaded:
            self.embedder.load()
        return self.embedder

    def chunk(self, segments: list[TranscriptSegment]) -> list[AudioChunk]:
        segments = [s for s in segments if s.text.strip()]
        if not segments:
            return []
        emb = self._embedder()
        vecs = np.stack([
            r.dense / max(np.linalg.norm(r.dense), 1e-9)
            for r in emb.embed([s.text for s in segments])
        ])

        groups: list[list[int]] = [[0]]
        centroid = vecs[0].copy()
        tokens = estimate_tokens(segments[0].text)
        for i in range(1, len(segments)):
            t = estimate_tokens(segments[i].text)
            c = centroid / max(np.linalg.norm(centroid), 1e-9)
            sim = float(vecs[i] @ c)
            if tokens + t > self.config.max_tokens or (
                sim < self.threshold
                and tokens >= self.config.min_chunk_tokens
            ):
                groups.append([i])
                centroid = vecs[i].copy()
                tokens = t
            else:
                groups[-1].append(i)
                centroid += vecs[i]
                tokens += t

        return [
            AudioChunk(
                text=" ".join(segments[i].text.strip() for i in grp),
                start=segments[grp[0]].start,
                end=segments[grp[-1]].end,
                speaker=segments[grp[0]].speaker,
                chunk_id=str(uuid.uuid4()),
            )
            for grp in groups
        ]
