"""Embeddings registry. Parity: reference ``embeddings/base.py:6``."""

from audio_rag_tpu.core.base import BaseEmbedder
from audio_rag_tpu.core.registry import Registry

EmbeddingsRegistry: Registry[BaseEmbedder] = Registry("embeddings")

__all__ = ["EmbeddingsRegistry"]
