"""Framework error taxonomy.

Parity: reference ``core/exceptions.py:4-66`` (13-class hierarchy rooted at
``AudioRAGError``). Names are kept identical so callers porting from the
reference catch the same exception types.
"""

from __future__ import annotations

from typing import Any

__all__ = [
    "AudioRAGError",
    "ConfigError",
    "ModelLoadError",
    "ModelNotLoadedError",
    "AudioProcessingError",
    "TranscriptionError",
    "DiarizationError",
    "AlignmentError",
    "ChunkingError",
    "EmbeddingError",
    "RetrievalError",
    "RerankingError",
    "GenerationError",
    "TTSError",
    "ResourceError",
    "CompilationError",
    "ShardingError",
]


class AudioRAGError(Exception):
    """Base class for all framework errors.

    Carries an optional structured ``context`` dict so service layers can emit
    machine-readable error payloads without string parsing.
    """

    def __init__(self, message: str, *, context: dict[str, Any] | None = None):
        super().__init__(message)
        self.message = message
        self.context = context or {}

    def to_dict(self) -> dict[str, Any]:
        return {
            "error": type(self).__name__,
            "message": self.message,
            "context": self.context,
        }


class ConfigError(AudioRAGError):
    """Invalid or unloadable configuration."""


class ModelLoadError(AudioRAGError):
    """A model failed to load/compile onto the device."""


class ModelNotLoadedError(AudioRAGError):
    """An operation required a model that has not been loaded."""


class AudioProcessingError(AudioRAGError):
    """Audio decode/resample/validation failure."""


class TranscriptionError(AudioRAGError):
    """ASR failure."""


class DiarizationError(AudioRAGError):
    """Speaker diarization failure."""


class AlignmentError(AudioRAGError):
    """Word→speaker alignment failure."""


class ChunkingError(AudioRAGError):
    """Chunking failure."""


class EmbeddingError(AudioRAGError):
    """Embedding failure."""


class RetrievalError(AudioRAGError):
    """Vector store / search failure."""


class RerankingError(AudioRAGError):
    """Cross-encoder reranking failure."""


class GenerationError(AudioRAGError):
    """LLM answer-synthesis failure."""


class TTSError(AudioRAGError):
    """Text-to-speech failure."""


class ResourceError(AudioRAGError):
    """HBM/host-memory budget exhausted or resource accounting failure."""


class CompilationError(AudioRAGError):
    """XLA compilation of a device program failed (TPU-native addition)."""


class ShardingError(AudioRAGError):
    """Invalid mesh/sharding specification (TPU-native addition)."""
