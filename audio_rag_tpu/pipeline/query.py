"""Query pipeline: embed → retrieve → rerank → (generate) → (speak).

Parity surface: reference ``pipeline/query.py:20-264`` — optional HyDE, embed
query, retrieve ``initial_k``(=20) when reranking else ``top_k``, rerank with
the ORIGINAL query (not the HyDE passage), speaker/time-formatted raw
response, optional LLM answer, optional TTS; ``get_context_for_llm`` emits
the XML-ish context block.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Any

from audio_rag_tpu.config.schema import AudioRAGConfig
from audio_rag_tpu.core.types import RetrievalResult
from audio_rag_tpu.embeddings.base import EmbeddingsRegistry
from audio_rag_tpu.expansion.hyde import HyDEExpander
from audio_rag_tpu.generation.base import create_generator
from audio_rag_tpu.generation.prompts import (
    SYSTEM_PROMPT,
    build_rag_prompt,
    format_timestamp,
)
from audio_rag_tpu.reranking.base import create_reranker
from audio_rag_tpu.retrieval.base import RetrievalRegistry
from audio_rag_tpu.tts.base import create_tts
from audio_rag_tpu.utils.decorators import timed
from audio_rag_tpu.utils.logging import get_logger
from audio_rag_tpu.utils.tracing import span

log = get_logger(__name__)

__all__ = ["QueryPipeline", "QueryResult", "format_context"]


def format_context(results: list[RetrievalResult]) -> str:
    """XML-ish context block for external LLM consumers
    (reference query.py:228-264)."""
    parts = ["<context>"]
    for i, r in enumerate(results, 1):
        parts.append(
            f'  <excerpt id="{i}" speaker="{r.speaker or "unknown"}" '
            f'start="{r.start:.1f}" end="{r.end:.1f}">'
        )
        parts.append(f"    {r.text}")
        parts.append("  </excerpt>")
    parts.append("</context>")
    return "\n".join(parts)


@dataclass
class QueryResult:
    query: str
    results: list[RetrievalResult]
    response: str
    answer: str | None = None
    audio: bytes | None = None
    expanded_query: str | None = None
    elapsed_s: float = 0.0
    stage_timings: dict[str, float] = field(default_factory=dict)

    def to_dict(self) -> dict[str, Any]:
        return {
            "query": self.query,
            "results": [r.to_dict() for r in self.results],
            "response": self.response,
            "answer": self.answer,
            "expanded_query": self.expanded_query,
            "elapsed_s": self.elapsed_s,
            "stage_timings": self.stage_timings,
            "has_audio": self.audio is not None,
        }


class QueryPipeline:
    def __init__(
        self,
        config: AudioRAGConfig,
        embedder=None,
        retriever=None,
        generator=None,
    ):
        self.config = config
        self._embedder = embedder
        self._retriever = retriever
        self._reranker = None
        self._reranker_built = False
        self._generator = generator
        self._generator_built = generator is not None
        self._expander = None
        self._tts = None
        self._tts_built = False

    # -- lazy components ---------------------------------------------------
    @property
    def embedder(self):
        if self._embedder is None:
            self._embedder = EmbeddingsRegistry.create(
                self.config.embedding.backend, self.config.embedding
            )
        if not self._embedder.is_loaded:
            self._embedder.load()
        return self._embedder

    @property
    def retriever(self):
        if self._retriever is None:
            self._retriever = RetrievalRegistry.create(
                self.config.retrieval.backend, self.config.retrieval
            )
        return self._retriever

    @property
    def reranker(self):
        if not self._reranker_built:
            self._reranker = create_reranker(self.config.reranking)
            if self._reranker is not None and not self._reranker.is_loaded:
                self._reranker.load()
            self._reranker_built = True
        return self._reranker

    @property
    def generator(self):
        if not self._generator_built:
            self._generator = create_generator(self.config.generation)
            if self._generator is not None and not self._generator.is_loaded:
                self._generator.load()
            self._generator_built = True
        return self._generator

    @property
    def expander(self):
        if self._expander is None:
            if self.config.expansion.backend == "prf":
                from audio_rag_tpu.expansion.prf import PRFExpander

                self._expander = PRFExpander(
                    self.config.expansion, self.embedder, self.retriever)
            else:
                self._expander = HyDEExpander(
                    self.config.expansion, self.generator)
        return self._expander

    @property
    def fused_engine(self):
        """Fused batched QueryEngine when the loaded backends support it
        (BGE-M3 embedder + TPU store): one device program per query batch
        instead of separate embed/search dispatches."""
        if not hasattr(self, "_fused"):
            self._fused = None
            try:
                from audio_rag_tpu.embeddings.bge import BGEM3Embedder
                from audio_rag_tpu.engine.query_engine import QueryEngine
                from audio_rag_tpu.retrieval.tpu_store import TPUVectorStore

                if isinstance(self.embedder, BGEM3Embedder) and isinstance(
                    self.retriever, TPUVectorStore
                ):
                    self._fused = QueryEngine(
                        self.embedder, self.retriever, None
                    )
            except Exception as exc:
                log.debug("fused engine unavailable: %s", exc)
        return self._fused

    def query_batch(
        self,
        queries: list[str],
        top_k: int | None = None,
        search_type: str | None = None,
        collection: str | None = None,
        rerank: bool | None = None,
    ) -> list[QueryResult]:
        """Batched query entry point (fused device path when available)."""
        top_k = top_k or self.config.retrieval.top_k
        search_type = search_type or self.config.retrieval.search_type
        do_rerank = (
            self.config.reranking.backend != "none"
            if rerank is None else rerank
        )
        fused = self.fused_engine
        if fused is not None:
            fused.collection = collection
            fused.reranker = self.reranker if do_rerank else None
            t0 = time.perf_counter()
            rows = fused.query_batch(
                queries, top_k=top_k, search_type=search_type,
                initial_k=self.config.reranking.initial_k,
                rerank=do_rerank,
            )
            dt = round((time.perf_counter() - t0) / max(len(queries), 1), 4)
            return [
                QueryResult(
                    query=q, results=row,
                    response=self._build_response(q, row), elapsed_s=dt,
                )
                for q, row in zip(queries, rows)
            ]
        return [
            self.query(q, top_k=top_k, search_type=search_type,
                       collection=collection, rerank=do_rerank)
            for q in queries
        ]

    @property
    def tts(self):
        if not self._tts_built:
            self._tts = create_tts(self.config.tts)
            if self._tts is not None and not self._tts.is_loaded:
                try:
                    self._tts.load()
                except Exception as exc:
                    log.warning("TTS backend failed to load: %s", exc)
                    self._tts = None
            if self._tts is None and self.config.tts.backend not in (
                "none", self.config.tts.fallback_backend
            ) and self.config.tts.fallback_backend != "none":
                # reference behavior: degrade to the fallback engine
                # (reference ``tts/base.py`` fallback chain)
                fb_cfg = self.config.tts.model_copy(
                    update={"backend": self.config.tts.fallback_backend}
                )
                try:
                    self._tts = create_tts(fb_cfg)
                    if self._tts is not None:
                        self._tts.load()
                except Exception as exc:  # pragma: no cover - defensive
                    log.warning("TTS fallback failed to load: %s", exc)
                    self._tts = None
            self._tts_built = True
        return self._tts

    # -- main entry --------------------------------------------------------
    @timed
    def query(
        self,
        query: str,
        top_k: int | None = None,
        search_type: str | None = None,
        collection: str | None = None,
        use_hyde: bool | None = None,
        rerank: bool | None = None,
        generate_answer: bool = False,
        speak_answer: bool = False,
        metadata_filter: dict[str, Any] | None = None,
    ) -> QueryResult:
        t_start = time.perf_counter()
        timings: dict[str, float] = {}
        top_k = top_k or self.config.retrieval.top_k
        search_type = search_type or self.config.retrieval.search_type
        use_hyde = (  # "expansion on": HyDE or PRF per config.backend
            self.config.expansion.backend in ("hyde", "prf")
            if use_hyde is None else use_hyde
        )
        do_rerank = (
            self.config.reranking.backend != "none"
            if rerank is None else rerank
        )

        def clock(name: str, t0: float) -> float:
            timings[name] = round(time.perf_counter() - t0, 4)
            return time.perf_counter()

        # 1. optional HyDE: embed the hypothesis instead of the query
        t0 = time.perf_counter()
        expanded = None
        embed_text = query
        if use_hyde:
            expanded = self.expander.expand_single(query)
            if expanded != query:
                embed_text = expanded
            t0 = clock("hyde", t0)

        # 2-4. embed → retrieve → rerank. The fused QueryEngine runs
        # embed+score+fuse+top-k as one device program — use it whenever the
        # request shape allows (no HyDE rewrite, no metadata filter).
        fused = self.fused_engine
        if (
            fused is not None and embed_text == query
            and metadata_filter is None
        ):
            with span("query.fused"):
                # the properties re-load backends evicted by the idle reaper
                fused.embedder = self.embedder
                rr = self.reranker if do_rerank else None
                if rr is not None and not rr.is_loaded:
                    rr.load()
                fused.collection = collection
                fused.reranker = rr
                results = fused.query_batch(
                    [query], top_k=top_k, search_type=search_type,
                    initial_k=self.config.reranking.initial_k,
                    rerank=do_rerank,
                )[0]
            t0 = clock("fused", t0)
        else:
            with span("query.embed"):
                emb = self.embedder.embed_query(embed_text)
            t0 = clock("embed", t0)

            # over-fetch when reranking (reference query.py:146-152)
            fetch_k = self.config.reranking.initial_k if do_rerank else top_k
            with span("query.search"):
                results = self.retriever.search(
                    emb, top_k=fetch_k, search_type=search_type,
                    collection=collection, metadata_filter=metadata_filter,
                )
            t0 = clock("search", t0)

            # rerank with the ORIGINAL query
            if do_rerank and self.reranker is not None and results:
                with span("query.rerank"):
                    results = self.reranker.rerank(query, results, top_k)
                t0 = clock("rerank", t0)
            else:
                results = results[:top_k]

        response = self._build_response(query, results)

        # 5. optional answer synthesis
        answer = None
        if generate_answer and results and self.generator is not None:
            try:
                answer = self.generator.generate(
                    build_rag_prompt(query, results), system=SYSTEM_PROMPT
                )
            except Exception as exc:
                log.warning("answer generation failed: %s", exc)
            t0 = clock("generate", t0)

        # 6. optional TTS
        audio = None
        if speak_answer and answer and self.tts is not None:
            try:
                audio = self.tts.synthesize(answer)
            except Exception as exc:
                log.warning("TTS failed: %s", exc)
            clock("tts", t0)

        return QueryResult(
            query=query,
            results=results,
            response=response,
            answer=answer,
            audio=audio,
            expanded_query=expanded,
            elapsed_s=round(time.perf_counter() - t_start, 4),
            stage_timings=timings,
        )

    # -- formatting --------------------------------------------------------
    @staticmethod
    def _build_response(query: str, results: list[RetrievalResult]) -> str:
        """Raw retrieval response: ``[speaker at MM:SS] text`` lines
        (reference query.py:217-226)."""
        if not results:
            return "No relevant content found."
        lines = []
        for r in results:
            who = r.speaker or "Speaker"
            lines.append(
                f"[{who} at {format_timestamp(r.start)}] {r.text}"
            )
        return "\n\n".join(lines)

    def get_context_for_llm(
        self,
        query: str,
        top_k: int | None = None,
        search_type: str | None = None,
        collection: str | None = None,
    ) -> str:
        """XML-ish context block for external LLM consumers
        (reference query.py:228-264)."""
        res = self.query(
            query, top_k=top_k, search_type=search_type,
            collection=collection, generate_answer=False,
        )
        return format_context(res.results)
