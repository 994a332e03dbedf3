"""API app factory + ``python -m audio_rag_tpu.api`` entry point.

Parity surface: reference ``api/app.py:22-118``: a ``create_app()`` factory
whose lifespan wires the job queue, store, pipelines and middleware; CORS;
the v1 router; health probes. Extras: optional inline worker thread (single-
node deployments skip the separate worker process) and a single-thread
device executor so concurrent HTTP requests serialize cleanly onto the TPU.
"""

from __future__ import annotations

import concurrent.futures
import threading

from audio_rag_tpu.api.config import APIConfig
from audio_rag_tpu.api.health import register_health_routes
from audio_rag_tpu.api.metrics import register_metrics_route
from audio_rag_tpu.api.http import App, Request, Response
from audio_rag_tpu.api.middleware import setup_middleware
from audio_rag_tpu.api.v1.router import register_v1_routes
from audio_rag_tpu.jobqueue.config import QueueConfig, StorageConfig
from audio_rag_tpu.jobqueue.queue import AudioRAGQueue
from audio_rag_tpu.jobqueue.store import JobStore
from audio_rag_tpu.utils.logging import get_logger, setup_logging

log = get_logger(__name__)

__all__ = ["create_app", "main"]


def create_app(
    config: APIConfig | None = None,
    rag=None,
    queue: AudioRAGQueue | None = None,
) -> App:
    """Build the app. ``rag``/``queue`` injectable for tests (the reference
    uses FastAPI dependency overrides; here they are constructor args)."""
    config = config or APIConfig.from_env()
    app = App(max_body_bytes=config.max_upload_bytes + (1 << 20),
              upload_dir=config.upload_dir)
    app.state["config"] = config

    if queue is None:
        store = JobStore(config.queue_db_path)
        qcfg = QueueConfig(
            storage=StorageConfig(db_path=config.queue_db_path)
        )
        queue = AudioRAGQueue(qcfg, store=store)
    app.state["queue"] = queue
    app.state["store"] = queue.store

    app.state["rag"] = rag
    app.state["rag_config"] = rag.config if rag is not None else None
    app.state["retriever"] = rag._retriever if rag is not None else None
    app.state["executor"] = concurrent.futures.ThreadPoolExecutor(
        max_workers=1, thread_name_prefix="device"
    )
    app.state["initialized"] = True

    setup_middleware(app, config.cors_origins)
    register_health_routes(app)
    register_v1_routes(app)
    # Prometheus text exposition over the stats the framework already
    # tracks (the reference has no metrics endpoint — SURVEY.md §5)
    register_metrics_route(app)

    # idle-model eviction (resources.unload_after_idle_seconds)
    @app.on_startup
    async def start_idle_reaper():
        import asyncio

        from audio_rag_tpu.resources.manager import get_resource_manager

        rag_cfg = app.state.get("rag_config")
        idle_s = (
            rag_cfg.resources.unload_after_idle_seconds
            if rag_cfg is not None else 0
        )
        if idle_s <= 0:
            return

        async def reap():
            while True:
                await asyncio.sleep(max(idle_s / 4, 10))
                try:
                    get_resource_manager().evict_idle(idle_s)
                except Exception as exc:
                    log.warning("idle eviction failed: %s", exc)

        app.state["idle_reaper"] = asyncio.create_task(reap())

    _register_frontend(app)

    @app.get("/api")
    async def root(request: Request) -> Response:
        return Response.json({
            "service": "audio-rag-tpu",
            "docs": "/api/v1",
            "health": "/health/ready",
        })

    if config.inline_worker and rag is not None:
        _start_inline_worker(app, queue, rag)
    return app


_MIME = {
    ".html": "text/html; charset=utf-8",
    ".js": "application/javascript",
    ".css": "text/css",
    ".svg": "image/svg+xml",
    ".png": "image/png",
}


def _register_frontend(app: App) -> None:
    """Serve the dependency-free web UI (frontend/) at ``/``."""
    import pathlib

    root = pathlib.Path(__file__).resolve().parents[2] / "frontend"
    if not root.is_dir():
        @app.get("/")
        async def no_ui(request: Request) -> Response:
            return Response.json({"service": "audio-rag-tpu",
                                  "docs": "/api/v1"})
        return

    async def serve_file(request: Request) -> Response:
        name = request.path_params.get("name") or "index.html"
        target = (root / name).resolve()
        # directory-exact containment (a bare prefix check would also admit
        # sibling dirs like frontend-x if routing/decoding ever changes)
        if not target.is_relative_to(root) or not target.is_file():
            from audio_rag_tpu.api.http import HTTPError

            raise HTTPError(404, "not found")
        return Response(
            target.read_bytes(),
            content_type=_MIME.get(target.suffix, "application/octet-stream"),
        )

    app.get("/")(serve_file)
    app.get("/ui/{name}")(serve_file)
    # top-level asset paths referenced by index.html
    app.get("/app.js")(serve_file_named(serve_file, "app.js"))
    app.get("/styles.css")(serve_file_named(serve_file, "styles.css"))


def serve_file_named(handler, name: str):
    async def inner(request: Request) -> Response:
        request.path_params["name"] = name
        return await handler(request)

    return inner


def _start_inline_worker(app: App, queue: AudioRAGQueue, rag) -> None:
    """Single-node mode: drain jobs on a daemon thread in this process."""
    from audio_rag_tpu.jobqueue.worker import TPUWorker

    worker = TPUWorker(
        queue.config, store=queue.store, rag_factory=lambda: rag
    )
    thread = threading.Thread(
        target=worker.start, name="inline-worker", daemon=True
    )
    thread.start()
    app.state["inline_worker"] = worker

    @app.on_shutdown
    async def stop_worker():
        worker.stop()


def main() -> None:  # pragma: no cover - CLI entry
    import argparse

    parser = argparse.ArgumentParser(description="audio_rag_tpu API server")
    parser.add_argument("--host", default="0.0.0.0")
    parser.add_argument("--port", type=int, default=8000)
    parser.add_argument("--config", default=None, help="AudioRAG config file")
    parser.add_argument("--env", default=None)
    parser.add_argument("--inline-worker", action="store_true")
    args = parser.parse_args()

    setup_logging("INFO")
    from audio_rag_tpu.utils.jax_cache import apply_platform_env

    apply_platform_env()
    from audio_rag_tpu.config.loader import load_config
    from audio_rag_tpu.pipeline.orchestrator import AudioRAG

    rag = AudioRAG(load_config(args.config, args.env))
    api_cfg = APIConfig.from_env()
    api_cfg.host, api_cfg.port = args.host, args.port
    api_cfg.inline_worker = args.inline_worker
    app = create_app(api_cfg, rag=rag)
    app.run(api_cfg.host, api_cfg.port)


if __name__ == "__main__":  # pragma: no cover
    main()
