"""Fixed-size word-window chunker.

Parity surface: reference ``chunking/fixed.py:16-129``: word-level windows of
``max_tokens`` words with ``overlap_tokens`` overlap, per-word interpolated
timing when word timestamps are missing, majority-speaker labeling.
"""

from __future__ import annotations

import uuid
from collections import Counter

from audio_rag_tpu.chunking.base import ChunkingRegistry
from audio_rag_tpu.config.schema import ChunkingConfig
from audio_rag_tpu.core.base import BaseChunker
from audio_rag_tpu.core.types import AudioChunk, TranscriptSegment, Word

__all__ = ["FixedSizeChunker"]


@ChunkingRegistry.register("fixed")
class FixedSizeChunker(BaseChunker):
    def __init__(self, config: ChunkingConfig | None = None):
        self.config = config or ChunkingConfig()

    def chunk(self, segments: list[TranscriptSegment]) -> list[AudioChunk]:
        words = self._collect_words(segments)
        if not words:
            return []
        size = self.config.max_tokens
        step = max(1, size - self.config.overlap_tokens)
        chunks: list[AudioChunk] = []
        for i in range(0, len(words), step):
            win = words[i: i + size]
            if not win:
                break
            chunks.append(
                AudioChunk(
                    text=" ".join(w.text for w in win),
                    start=win[0].start,
                    end=win[-1].end,
                    speaker=self._majority_speaker(win),
                    chunk_id=str(uuid.uuid4()),
                )
            )
            if i + size >= len(words):
                break
        return chunks

    def _collect_words(self, segments: list[TranscriptSegment]) -> list[Word]:
        words: list[Word] = []
        for seg in segments:
            if seg.words:
                words.extend(seg.words)
            else:
                # interpolate timings across the segment
                parts = seg.text.split()
                if not parts:
                    continue
                step = seg.duration / len(parts)
                words.extend(
                    Word(
                        w,
                        round(seg.start + k * step, 3),
                        round(seg.start + (k + 1) * step, 3),
                        speaker=seg.speaker,
                    )
                    for k, w in enumerate(parts)
                )
        return words

    @staticmethod
    def _majority_speaker(words: list[Word]) -> str | None:
        counts = Counter(w.speaker for w in words if w.speaker)
        if not counts:
            return None
        return counts.most_common(1)[0][0]
