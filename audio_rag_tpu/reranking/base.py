"""Reranker registry + factory.

Parity: reference ``reranking/base.py:60-90`` — its classmethod registry
returns ``None`` for backend "none"; :func:`create_reranker` keeps that
contract on top of the standard Registry.
"""

from audio_rag_tpu.config.schema import RerankingConfig
from audio_rag_tpu.core.base import BaseReranker
from audio_rag_tpu.core.registry import Registry

RerankerRegistry: Registry[BaseReranker] = Registry("reranking")


def create_reranker(config: RerankingConfig) -> BaseReranker | None:
    if config.backend == "none":
        return None
    return RerankerRegistry.create(config.backend, config)


__all__ = ["RerankerRegistry", "create_reranker"]
