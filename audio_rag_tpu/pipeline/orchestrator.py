"""AudioRAG facade — the framework's public entry point.

Parity surface: reference ``pipeline/orchestrator.py:16-193``: shares one
embedder/retriever (and here also one generator) across the ingestion and
query pipelines, exposes ``ingest/ingest_batch/query/get_context/status/
clear_collection/unload_all`` and a ``from_config`` constructor.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any

import numpy as np

from audio_rag_tpu.config.loader import load_config
from audio_rag_tpu.config.schema import AudioRAGConfig
from audio_rag_tpu.pipeline.ingestion import IngestionPipeline, IngestionResult
from audio_rag_tpu.pipeline.query import QueryPipeline, QueryResult
from audio_rag_tpu.resources.manager import get_resource_manager
from audio_rag_tpu.utils.decorators import get_stage_timings
from audio_rag_tpu.utils.logging import get_logger, setup_logging

log = get_logger(__name__)

__all__ = ["AudioRAG"]


def _trace_summary() -> dict[str, Any]:
    try:
        from audio_rag_tpu.utils.tracing import get_trace_summary

        return get_trace_summary()
    except Exception:
        return {}


class AudioRAG:
    def __init__(self, config: AudioRAGConfig | None = None):
        self.config = config or AudioRAGConfig()
        setup_logging(self.config.log_level)
        from audio_rag_tpu.utils.jax_cache import enable_compilation_cache

        enable_compilation_cache()
        rm = get_resource_manager(self.config.resources.max_hbm_gb)
        if self.config.resources.pin_query_models:
            # serving policy: the query path's models never leave HBM —
            # ingest's whisper↔llama swaps happen around them
            rm.pin("embeddings")
            rm.pin("reranking")

        # singletons shared by both pipelines (reference orchestrator.py:40-75)
        from audio_rag_tpu.embeddings.base import EmbeddingsRegistry
        from audio_rag_tpu.retrieval.base import RetrievalRegistry

        self._embedder = EmbeddingsRegistry.create(
            self.config.embedding.backend, self.config.embedding
        )
        self._retriever = RetrievalRegistry.create(
            self.config.retrieval.backend, self.config.retrieval
        )
        self.ingestion = IngestionPipeline(
            self.config, embedder=self._embedder, retriever=self._retriever
        )
        self.querying = QueryPipeline(
            self.config, embedder=self._embedder, retriever=self._retriever
        )

    @classmethod
    def from_config(
        cls,
        config_path: str | Path | None = None,
        env: str | None = None,
        configs_dir: str | Path = "configs",
    ) -> "AudioRAG":
        return cls(load_config(config_path, env, configs_dir))

    # -- ingestion ---------------------------------------------------------
    def ingest(
        self,
        audio: str | Path | np.ndarray,
        sample_rate: int | None = None,
        collection: str | None = None,
        diarize: bool = True,
        metadata: dict[str, Any] | None = None,
    ) -> IngestionResult:
        return self.ingestion.ingest(
            audio, sample_rate, collection, diarize, metadata
        )

    def ingest_batch(
        self, audios: list, collection: str | None = None, **kw: Any
    ) -> list[IngestionResult]:
        return self.ingestion.ingest_batch(audios, collection, **kw)

    # -- querying ----------------------------------------------------------
    def query(self, query: str, **kw: Any) -> QueryResult:
        return self.querying.query(query, **kw)

    def query_batch(self, queries: list[str], **kw: Any) -> list[QueryResult]:
        return self.querying.query_batch(queries, **kw)

    def get_context(self, query: str, **kw: Any) -> str:
        return self.querying.get_context_for_llm(query, **kw)

    # -- management --------------------------------------------------------
    def status(self) -> dict[str, Any]:
        from audio_rag_tpu.engine.engine import get_engine

        retriever = self._retriever
        collections = {}
        if hasattr(retriever, "list_collections"):
            for name in retriever.list_collections():
                collections[name] = retriever.count(name)
        return {
            "config": {
                "asr": self.config.asr.backend,
                "asr_model": self.config.asr.model_size,
                "diarization": self.config.diarization.backend,
                "embedding": self.config.embedding.backend,
                "retrieval": self.config.retrieval.backend,
                "search_type": self.config.retrieval.search_type,
                "reranking": self.config.reranking.backend,
                "generation": self.config.generation.backend,
            },
            "engine": get_engine().status(),
            "resources": get_resource_manager().status(),
            "collections": collections,
            "stage_timings": get_stage_timings(),
            "traces": _trace_summary(),
        }

    def clear_collection(self, collection: str | None = None) -> bool:
        return self._retriever.delete_collection(collection)

    def unload_all(self) -> None:
        get_resource_manager().unload_all()
