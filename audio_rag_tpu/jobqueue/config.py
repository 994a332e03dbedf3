"""Queue configuration.

Parity surface: reference ``queue/config.py:11-194``: per-priority queue
definitions (timeout + max depth), worker config (HBM budget, heartbeat
interval, preload), storage config and TTLs (idempotency/result/checkpoint
24 h). Redis connection settings become a SQLite path.
"""

from __future__ import annotations

from pydantic import BaseModel, Field

__all__ = ["QueueDefinition", "WorkerConfig", "StorageConfig", "QueueConfig"]


class QueueDefinition(BaseModel):
    name: str
    timeout_s: int = Field(default=1800, ge=1)
    max_depth: int = Field(default=100, ge=1)


class WorkerConfig(BaseModel):
    max_hbm_gb: float = Field(default=10.0, ge=1.0)
    heartbeat_interval_s: int = Field(default=30, ge=1)
    heartbeat_ttl_s: int = Field(default=300, ge=1)
    preload_models: bool = True
    poll_interval_s: float = Field(default=0.5, gt=0)
    #: claim up to this many compatible queued jobs at once and ingest
    #: them STAGE-GROUPED (pipeline.ingest_batch): the whisper↔llama HBM
    #: swap of the contextual stage is paid once per claimed batch
    #: instead of twice per job (measured 1.37× on 3×8-min files).
    #: Tradeoffs at >1: per-stage progress/checkpoints coarsen to the
    #: batch (a crash requeues the whole batch from scratch) and
    #: cancellation is observed between batches, not stages.
    batch_claim: int = Field(default=1, ge=1, le=16)


class StorageConfig(BaseModel):
    #: SQLite database path; ":memory:" for tests
    db_path: str = "./data/queue.db"
    idempotency_ttl_s: int = Field(default=86400, ge=1)
    result_ttl_s: int = Field(default=86400, ge=1)
    checkpoint_ttl_s: int = Field(default=86400, ge=1)


class QueueConfig(BaseModel):
    queues: list[QueueDefinition] = Field(
        default_factory=lambda: [
            QueueDefinition(name="high", timeout_s=3600, max_depth=50),
            QueueDefinition(name="normal", timeout_s=1800, max_depth=100),
            QueueDefinition(name="low", timeout_s=3600, max_depth=200),
        ]
    )
    worker: WorkerConfig = Field(default_factory=WorkerConfig)
    storage: StorageConfig = Field(default_factory=StorageConfig)

    def queue_for_priority(self, priority_name: str) -> QueueDefinition:
        mapping = {
            "CRITICAL": "high", "HIGH": "high",
            "NORMAL": "normal", "LOW": "low",
        }
        name = mapping.get(priority_name.upper(), "normal")
        for q in self.queues:
            if q.name == name:
                return q
        return self.queues[0]
