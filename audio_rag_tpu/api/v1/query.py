"""Query endpoints.

Parity surface: reference ``api/v1/query.py:21-242``: ``POST /api/v1/query``
with the full RAG parameter set (search_type / use_hyde / rerank /
generate_answer / include_context), backed by a process-wide pipeline
singleton shared with ingestion.
"""

from __future__ import annotations

import asyncio

from audio_rag_tpu.api.config import APIConfig
from audio_rag_tpu.api.deps import authenticate, check_rate_limit
from audio_rag_tpu.api.http import App, HTTPError, Request, Response
from audio_rag_tpu.api.schemas import (
    QueryRequest,
    QueryResponse,
    RetrievalResultModel,
)

__all__ = ["register_query_routes"]


def _coalescer(app: App, rag):
    """Process-wide QueryCoalescer, built lazily; its device batches run
    through the app's single device-work executor (one device thread)."""
    c = app.state.get("query_coalescer")
    if c is None:
        from audio_rag_tpu.engine.query_coalescer import QueryCoalescer

        executor = app.state["executor"]
        config = app.state["config"]
        c = QueryCoalescer(
            rag.querying,
            run_in=lambda fn: executor.submit(fn).result(),
            linger_s=getattr(config, "coalesce_linger_ms", 0.0) / 1000.0,
        )
        app.state["query_coalescer"] = c
    return c


def register_query_routes(app: App) -> None:
    config: APIConfig = app.state["config"]

    @app.on_shutdown
    async def _stop_coalescer() -> None:
        c = app.state.get("query_coalescer")
        if c is not None:
            c.stop()

    @app.post("/api/v1/query")
    async def query(request: Request) -> Response:
        authenticate(request, config)
        check_rate_limit(request, config, "query", app.state["store"])
        body = QueryRequest(**(request.json() or {}))

        rag = app.state.get("rag")
        if rag is None:
            raise HTTPError(503, "query pipeline not initialized")

        # device work runs off the event loop (single worker: FIFO fairness)
        loop = asyncio.get_running_loop()

        # search-only requests coalesce: concurrent queries that arrive
        # while a batch is on the device ride the NEXT fused batch
        # together instead of paying one dispatch each (identical
        # per-query results — engine/query_coalescer.py). HyDE /
        # generation / TTS / filtered requests keep the per-request path.
        coalescible = (
            config.coalesce_queries
            and not body.use_hyde and not body.generate_answer
            and not body.speak_answer and not body.metadata_filter
        )
        if coalescible:
            result = await asyncio.wrap_future(
                _coalescer(app, rag).submit(
                    body.query, top_k=body.top_k,
                    search_type=body.search_type,
                    collection=body.collection, rerank=body.rerank,
                ))
        else:
            def run():
                return rag.query(
                    body.query,
                    top_k=body.top_k,
                    search_type=body.search_type,
                    collection=body.collection,
                    use_hyde=body.use_hyde,
                    rerank=body.rerank,
                    generate_answer=body.generate_answer,
                    speak_answer=body.speak_answer,
                    metadata_filter=body.metadata_filter,
                )

            result = await loop.run_in_executor(app.state["executor"], run)
        context = None
        if body.include_context and result.results:
            # format from THIS request's results — re-running
            # get_context_for_llm here would dispatch a second device
            # query from the event-loop thread, racing the coalescer's
            # batch on the device executor and blocking the loop (and
            # every WS session) for the relay round trip
            from audio_rag_tpu.pipeline.query import format_context

            context = format_context(result.results)
        audio_b64 = None
        if body.speak_answer and getattr(result, "audio", None):
            import base64

            audio_b64 = base64.b64encode(result.audio).decode("ascii")
        payload = QueryResponse(
            query=result.query,
            results=[
                RetrievalResultModel(**r.to_dict()) for r in result.results
            ],
            response=result.response,
            answer=result.answer,
            expanded_query=result.expanded_query,
            context=context,
            answer_audio_b64=audio_b64,
            elapsed_s=result.elapsed_s,
            stage_timings=result.stage_timings,
            request_id=request.context.get("request_id"),
        )
        return Response.json(payload.model_dump())

    @app.get("/api/v1/status")
    async def status(request: Request) -> Response:
        authenticate(request, config)
        rag = app.state.get("rag")
        if rag is None:
            raise HTTPError(503, "pipeline not initialized")
        return Response.json(rag.status())
