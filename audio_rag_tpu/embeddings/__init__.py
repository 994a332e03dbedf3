from audio_rag_tpu.embeddings.base import EmbeddingsRegistry

from audio_rag_tpu.embeddings import bge as _bge  # noqa: F401
from audio_rag_tpu.embeddings import e5 as _e5  # noqa: F401
from audio_rag_tpu.embeddings import fake as _fake  # noqa: F401

__all__ = ["EmbeddingsRegistry"]
