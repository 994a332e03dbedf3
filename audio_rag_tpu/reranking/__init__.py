from audio_rag_tpu.reranking.base import RerankerRegistry, create_reranker

from audio_rag_tpu.reranking import bge as _bge  # noqa: F401
from audio_rag_tpu.reranking import fake as _fake  # noqa: F401

__all__ = ["RerankerRegistry", "create_reranker"]
