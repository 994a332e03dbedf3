"""Canonical data model shared by every layer of the framework.

Parity target: the dataclasses in reference ``core/base.py:8-98`` (Word,
TranscriptSegment, AudioChunk, SparseVector, EmbeddingResult, RetrievalResult).
TPU-first deltas:

* Embeddings carry ``numpy.ndarray`` (host) views; device placement is owned
  by the inference engine / vector store, never by the data model.
* ``SparseVector`` stores parallel int32/float32 arrays (CSR-friendly) rather
  than a dict, so batches concatenate into device-resident postings without
  per-item Python work. Dict-style access is kept for API compatibility.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Iterator, Mapping, Sequence

import numpy as np

__all__ = [
    "Word",
    "TranscriptSegment",
    "AudioChunk",
    "SparseVector",
    "EmbeddingResult",
    "RetrievalResult",
]


@dataclass
class Word:
    """A single recognized word with timing and optional speaker attribution."""

    text: str
    start: float
    end: float
    probability: float = 1.0
    speaker: str | None = None

    @property
    def duration(self) -> float:
        return self.end - self.start

    def to_dict(self) -> dict[str, Any]:
        return {
            "text": self.text,
            "start": self.start,
            "end": self.end,
            "probability": self.probability,
            "speaker": self.speaker,
        }

    @classmethod
    def from_dict(cls, d: Mapping[str, Any]) -> "Word":
        return cls(
            text=d["text"],
            start=float(d["start"]),
            end=float(d["end"]),
            probability=float(d.get("probability", 1.0)),
            speaker=d.get("speaker"),
        )


@dataclass
class TranscriptSegment:
    """A contiguous span of transcript, optionally speaker-attributed."""

    text: str
    start: float
    end: float
    speaker: str | None = None
    words: list[Word] = field(default_factory=list)
    language: str | None = None
    avg_logprob: float | None = None

    @property
    def duration(self) -> float:
        return self.end - self.start

    def to_dict(self) -> dict[str, Any]:
        return {
            "text": self.text,
            "start": self.start,
            "end": self.end,
            "speaker": self.speaker,
            "words": [w.to_dict() for w in self.words],
            "language": self.language,
            "avg_logprob": self.avg_logprob,
        }

    @classmethod
    def from_dict(cls, d: Mapping[str, Any]) -> "TranscriptSegment":
        return cls(
            text=d["text"],
            start=float(d["start"]),
            end=float(d["end"]),
            speaker=d.get("speaker"),
            words=[Word.from_dict(w) for w in d.get("words", [])],
            language=d.get("language"),
            avg_logprob=d.get("avg_logprob"),
        )


@dataclass
class AudioChunk:
    """A retrieval unit: a chunk of transcript with provenance metadata."""

    text: str
    start: float
    end: float
    speaker: str | None = None
    chunk_id: str | None = None
    metadata: dict[str, Any] = field(default_factory=dict)

    @property
    def duration(self) -> float:
        return self.end - self.start

    def to_dict(self) -> dict[str, Any]:
        return {
            "text": self.text,
            "start": self.start,
            "end": self.end,
            "speaker": self.speaker,
            "chunk_id": self.chunk_id,
            "metadata": dict(self.metadata),
        }

    @classmethod
    def from_dict(cls, d: Mapping[str, Any]) -> "AudioChunk":
        return cls(
            text=d["text"],
            start=float(d["start"]),
            end=float(d["end"]),
            speaker=d.get("speaker"),
            chunk_id=d.get("chunk_id"),
            metadata=dict(d.get("metadata", {})),
        )


class SparseVector:
    """Sparse lexical embedding: parallel (indices, values) arrays.

    Array-native replacement for the reference's ``dict[int, float]`` sparse
    vectors (``core/base.py:63-75``): batches of these concatenate directly
    into the device-resident CSR postings used by the TPU vector store.
    """

    __slots__ = ("indices", "values")

    def __init__(
        self,
        indices: Sequence[int] | np.ndarray = (),
        values: Sequence[float] | np.ndarray = (),
    ):
        idx = np.asarray(indices, dtype=np.int32).reshape(-1)
        val = np.asarray(values, dtype=np.float32).reshape(-1)
        if idx.shape != val.shape:
            raise ValueError(
                f"indices/values length mismatch: {idx.shape} vs {val.shape}"
            )
        # Canonical order: ascending token id (dedup keeps the max weight,
        # matching BGE-M3's per-token max-pool semantics).
        if idx.size:
            order = np.argsort(idx, kind="stable")
            idx, val = idx[order], val[order]
            if np.any(idx[1:] == idx[:-1]):
                uniq, inv = np.unique(idx, return_inverse=True)
                merged = np.full(uniq.shape, -np.inf, dtype=np.float32)
                np.maximum.at(merged, inv, val)
                idx, val = uniq.astype(np.int32), merged
        self.indices = idx
        self.values = val

    @classmethod
    def from_dict(cls, d: Mapping[int, float]) -> "SparseVector":
        if not d:
            return cls()
        items = sorted(d.items())
        return cls([k for k, _ in items], [v for _, v in items])

    def to_dict(self) -> dict[int, float]:
        return {int(i): float(v) for i, v in zip(self.indices, self.values)}

    @property
    def nnz(self) -> int:
        return int(self.indices.size)

    def __len__(self) -> int:
        return self.nnz

    def __bool__(self) -> bool:
        return self.nnz > 0

    def __iter__(self) -> Iterator[tuple[int, float]]:
        return iter(zip(self.indices.tolist(), self.values.tolist()))

    def __getitem__(self, token_id: int) -> float:
        pos = np.searchsorted(self.indices, token_id)
        if pos < self.indices.size and self.indices[pos] == token_id:
            return float(self.values[pos])
        raise KeyError(token_id)

    def get(self, token_id: int, default: float = 0.0) -> float:
        try:
            return self[token_id]
        except KeyError:
            return default

    def dot(self, other: "SparseVector") -> float:
        """Sparse-sparse inner product (merge join on sorted ids)."""
        if not self or not other:
            return 0.0
        common, ia, ib = np.intersect1d(
            self.indices, other.indices, assume_unique=True, return_indices=True
        )
        if common.size == 0:
            return 0.0
        return float(np.dot(self.values[ia], other.values[ib]))

    def __repr__(self) -> str:
        return f"SparseVector(nnz={self.nnz})"


@dataclass
class EmbeddingResult:
    """Output of an embedder: dense vector and optional sparse lexical weights."""

    dense: np.ndarray | None = None
    sparse: SparseVector | None = None
    text: str | None = None

    @property
    def dim(self) -> int:
        return 0 if self.dense is None else int(self.dense.shape[-1])


@dataclass
class RetrievalResult:
    """One search hit: chunk payload plus relevance score."""

    text: str
    score: float
    start: float = 0.0
    end: float = 0.0
    speaker: str | None = None
    chunk_id: str | None = None
    metadata: dict[str, Any] = field(default_factory=dict)

    def to_dict(self) -> dict[str, Any]:
        return {
            "text": self.text,
            "score": self.score,
            "start": self.start,
            "end": self.end,
            "speaker": self.speaker,
            "chunk_id": self.chunk_id,
            "metadata": dict(self.metadata),
        }

    @classmethod
    def from_dict(cls, d: Mapping[str, Any]) -> "RetrievalResult":
        return cls(
            text=d["text"],
            score=float(d["score"]),
            start=float(d.get("start", 0.0)),
            end=float(d.get("end", 0.0)),
            speaker=d.get("speaker"),
            chunk_id=d.get("chunk_id"),
            metadata=dict(d.get("metadata", {})),
        )
