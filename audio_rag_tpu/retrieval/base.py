"""Retrieval registry. Parity: reference ``retrieval/base.py:6``."""

from audio_rag_tpu.core.base import BaseRetriever
from audio_rag_tpu.core.registry import Registry

RetrievalRegistry: Registry[BaseRetriever] = Registry("retrieval")

__all__ = ["RetrievalRegistry"]
