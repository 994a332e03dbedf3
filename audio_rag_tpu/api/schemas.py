"""Request/response schemas.

Parity surface: reference ``api/schemas.py:15-289`` — pydantic models for
errors, query, ingest, job status/cancel, collections, pagination. Validation
errors surface as 422 with field detail (the middleware maps
``pydantic.ValidationError``).
"""

from __future__ import annotations

from typing import Any, Literal

from pydantic import BaseModel, Field

__all__ = [
    "ErrorResponse",
    "QueryRequest",
    "QueryResponse",
    "RetrievalResultModel",
    "IngestResponse",
    "JobStatusResponse",
    "JobCancelResponse",
    "CollectionInfo",
    "QueueStatsResponse",
]


class ErrorResponse(BaseModel):
    error: str
    detail: str | None = None
    request_id: str | None = None
    recoverable: bool | None = None


class QueryRequest(BaseModel):
    query: str = Field(min_length=1, max_length=4096)
    collection: str | None = None
    top_k: int = Field(default=5, ge=1, le=100)
    search_type: Literal["dense", "sparse", "hybrid"] = "hybrid"
    use_hyde: bool = False
    rerank: bool = True
    generate_answer: bool = False
    speak_answer: bool = False
    include_context: bool = False
    metadata_filter: dict[str, Any] | None = None


class RetrievalResultModel(BaseModel):
    text: str
    score: float
    start: float
    end: float
    speaker: str | None = None
    chunk_id: str | None = None
    metadata: dict[str, Any] = Field(default_factory=dict)


class QueryResponse(BaseModel):
    query: str
    results: list[RetrievalResultModel]
    response: str
    answer: str | None = None
    expanded_query: str | None = None
    context: str | None = None
    #: base64 WAV of the spoken answer when ``speak_answer`` was requested
    #: and a TTS backend is live (the reference only wrote TTS output to
    #: server-side files; this exposes it through the API)
    answer_audio_b64: str | None = None
    elapsed_s: float
    stage_timings: dict[str, float] = Field(default_factory=dict)
    request_id: str | None = None


class IngestResponse(BaseModel):
    job_id: str
    status: str
    queue: str
    estimated_wait_s: float
    collection: str | None = None
    request_id: str | None = None


class JobStatusResponse(BaseModel):
    job_id: str
    status: str
    stage: str | None = None
    progress: float
    queue: str | None = None
    error: str | None = None
    created_at: float | None = None
    updated_at: float | None = None
    result: dict[str, Any] | None = None


class JobCancelResponse(BaseModel):
    job_id: str
    cancelled: bool


class CollectionInfo(BaseModel):
    name: str
    count: int
    dim: int | None = None
    hbm_bytes: int | None = None


class QueueStatsResponse(BaseModel):
    queues: dict[str, dict[str, Any]]
    workers: dict[str, dict[str, Any]]
