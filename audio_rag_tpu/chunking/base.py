"""Chunking registry + shared token estimate.

Parity: reference ``chunking/base.py:6`` and the ``len//4`` token heuristic
(``chunking/speaker_turn.py:158-164``).
"""

from audio_rag_tpu.core.base import BaseChunker
from audio_rag_tpu.core.registry import Registry

ChunkingRegistry: Registry[BaseChunker] = Registry("chunking")


def estimate_tokens(text: str) -> int:
    """Cheap token estimate: ~4 chars/token (reference heuristic)."""
    return max(1, len(text) // 4)


__all__ = ["ChunkingRegistry", "estimate_tokens"]
