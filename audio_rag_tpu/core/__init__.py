"""Core layer: data model, backend ABCs, plugin registry, exceptions, resilience.

Parity: reference `src/audio_rag/core/` (SURVEY.md §1 L1).
"""

from audio_rag_tpu.core.exceptions import AudioRAGError
from audio_rag_tpu.core.registry import Registry
from audio_rag_tpu.core.types import (
    AudioChunk,
    EmbeddingResult,
    RetrievalResult,
    SparseVector,
    TranscriptSegment,
    Word,
)

__all__ = [
    "AudioRAGError",
    "Registry",
    "Word",
    "TranscriptSegment",
    "AudioChunk",
    "SparseVector",
    "EmbeddingResult",
    "RetrievalResult",
]
