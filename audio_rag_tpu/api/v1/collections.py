"""Collection endpoints.

Parity surface: reference ``api/v1/collections.py:18-49`` (list/info hitting
Qdrant) and ``api/v1/query.py`` collection count/delete — served here by the
in-process vector store (no hardcoded host, unlike the reference).
"""

from __future__ import annotations

from audio_rag_tpu.api.config import APIConfig
from audio_rag_tpu.api.deps import authenticate
from audio_rag_tpu.api.http import App, HTTPError, Request, Response
from audio_rag_tpu.api.schemas import CollectionInfo

__all__ = ["register_collection_routes"]


def register_collection_routes(app: App) -> None:
    config: APIConfig = app.state["config"]

    def retriever():
        r = app.state.get("retriever")
        if r is None:
            raise HTTPError(503, "vector store not initialized")
        return r

    @app.get("/api/v1/collections")
    async def list_collections(request: Request) -> Response:
        authenticate(request, config)
        r = retriever()
        out = []
        for name in r.list_collections():
            info = r.collection_info(name)
            out.append(CollectionInfo(
                name=name, count=info["count"], dim=info["dim"],
                hbm_bytes=info["hbm_bytes"],
            ).model_dump())
        return Response.json({"collections": out})

    @app.get("/api/v1/collections/{name}")
    async def collection_info(request: Request) -> Response:
        authenticate(request, config)
        r = retriever()
        name = request.path_params["name"]
        if not r.collection_exists(name):
            raise HTTPError(404, f"collection {name!r} not found")
        info = r.collection_info(name)
        return Response.json(CollectionInfo(
            name=name, count=info["count"], dim=info["dim"],
            hbm_bytes=info["hbm_bytes"],
        ).model_dump())

    @app.delete("/api/v1/collections/{name}")
    async def delete_collection(request: Request) -> Response:
        authenticate(request, config)
        r = retriever()
        name = request.path_params["name"]
        existed = r.delete_collection(name)
        if not existed:
            raise HTTPError(404, f"collection {name!r} not found")
        return Response.json({"deleted": name})
