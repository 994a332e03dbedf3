"""API configuration.

Parity surface: reference ``api/config.py:10-110``: tier-based rate limits
(free/basic/premium × query/ingest/status), request timeouts, upload limits
(500 MB, 8 extensions), and a dev API-key table mapping keys to
{tenant_id, tier}. Production deployments override keys via
``AUDIO_RAG_API_KEYS`` (JSON) or the config file.
"""

from __future__ import annotations

import json
import os

from pydantic import BaseModel, Field

__all__ = ["RateLimitTier", "APIConfig", "DEV_API_KEYS"]


class RateLimitTier(BaseModel):
    query_per_minute: int = 30
    ingest_per_hour: int = 10
    status_per_minute: int = 120


DEFAULT_TIERS: dict[str, RateLimitTier] = {
    "free": RateLimitTier(query_per_minute=30, ingest_per_hour=10,
                          status_per_minute=120),
    "basic": RateLimitTier(query_per_minute=120, ingest_per_hour=50,
                           status_per_minute=600),
    "premium": RateLimitTier(query_per_minute=600, ingest_per_hour=500,
                             status_per_minute=3000),
}

#: development keys (reference api/config.py:95-110); replace in production
DEV_API_KEYS: dict[str, dict[str, str]] = {
    "dev-key-free": {"tenant_id": "dev_tenant_free", "tier": "free"},
    "dev-key-basic": {"tenant_id": "dev_tenant_basic", "tier": "basic"},
    "dev-key-premium": {"tenant_id": "dev_tenant_premium", "tier": "premium"},
}


class APIConfig(BaseModel):
    host: str = "0.0.0.0"
    port: int = 8000
    cors_origins: list[str] = Field(default_factory=lambda: ["*"])
    max_upload_bytes: int = 500 * 1024 * 1024
    allowed_upload_extensions: list[str] = Field(
        default_factory=lambda: [
            ".wav", ".mp3", ".m4a", ".flac", ".ogg", ".opus", ".webm", ".mp4",
        ]
    )
    max_audio_duration_minutes: int = 480  # hour-scale is first-class
    request_timeout_s: float = 120.0
    tiers: dict[str, RateLimitTier] = Field(
        default_factory=lambda: dict(DEFAULT_TIERS)
    )
    api_keys: dict[str, dict[str, str]] = Field(
        default_factory=lambda: dict(DEV_API_KEYS)
    )
    upload_dir: str = "./data/uploads"
    queue_db_path: str = "./data/queue.db"
    #: run an in-process worker thread instead of a separate worker process
    inline_worker: bool = False
    #: coalesce concurrent search-only queries into fused device batches
    #: (engine/query_coalescer.py) — identical per-query results; raises
    #: the server's concurrent-QPS ceiling from one-dispatch-per-request
    #: toward the fused batch path's throughput
    coalesce_queries: bool = True
    #: post-arrival drain window (ms) for the query coalescer: concurrent
    #: clients woken from the previous batch resubmit one at a time on
    #: this 1-CPU host; a few ms of linger fills the next batch instead
    #: of shipping the first resubmission alone (measured on the
    #: streaming mux: 3.87→7.5 of 8 slots). Noise vs the ~100 ms+ fused
    #: batch it joins.
    coalesce_linger_ms: float = 4.0
    #: require an API key on GET /metrics. Default open: in-cluster
    #: Prometheus scrape (the Helm annotations) can't carry per-tenant
    #: keys, and the endpoint is operational gauges only — but it DOES
    #: expose queue depths and resident model names, so deployments
    #: exposing the port beyond the cluster should set this true
    #: (AUDIO_RAG_METRICS_AUTH=1)
    metrics_require_auth: bool = False

    @classmethod
    def from_env(cls) -> "APIConfig":
        cfg = cls()
        raw = os.environ.get("AUDIO_RAG_API_KEYS")
        if raw:
            try:
                cfg.api_keys = json.loads(raw)
            except json.JSONDecodeError:
                pass
        if os.environ.get("AUDIO_RAG_API_PORT"):
            cfg.port = int(os.environ["AUDIO_RAG_API_PORT"])
        if os.environ.get("AUDIO_RAG_METRICS_AUTH"):
            cfg.metrics_require_auth = os.environ[
                "AUDIO_RAG_METRICS_AUTH"] not in ("0", "false", "")
        return cfg
