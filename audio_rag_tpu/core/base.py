"""Abstract interfaces for all pluggable backends.

Parity: reference ``core/base.py:100-217`` (BaseASR, BaseDiarizer,
BaseChunker, BaseEmbedder, BaseRetriever, BaseTTS — each with
load/unload/is_loaded + a domain method and a VRAM estimate).

TPU-first deltas:

* ``vram_required`` becomes ``hbm_required_gb``: the static HBM budget a
  backend's parameters + compiled executables need on the mesh. A property
  named ``vram_required`` is kept as an alias for reference API parity.
* ``load()`` binds the backend to an :class:`~audio_rag_tpu.engine.engine.
  InferenceEngine` (device mesh owner) instead of allocating CUDA memory.
"""

from __future__ import annotations

from abc import ABC, abstractmethod
from typing import TYPE_CHECKING, Any, Iterable

import numpy as np

from audio_rag_tpu.core.exceptions import ModelNotLoadedError
from audio_rag_tpu.core.types import (
    AudioChunk,
    EmbeddingResult,
    RetrievalResult,
    TranscriptSegment,
)

if TYPE_CHECKING:
    from audio_rag_tpu.engine.engine import InferenceEngine

__all__ = [
    "DeviceBackend",
    "BaseASR",
    "BaseDiarizer",
    "BaseChunker",
    "BaseEmbedder",
    "BaseRetriever",
    "BaseReranker",
    "BaseGenerator",
    "BaseTTS",
]


class DeviceBackend(ABC):
    """Common lifecycle for backends that own device state."""

    #: static estimate of HBM needed (params + workspace), in GB
    hbm_required_gb: float = 0.0

    def __init__(self) -> None:
        self._loaded = False
        self._engine: "InferenceEngine | None" = None

    @property
    def vram_required(self) -> float:
        """Reference-compatible alias for :attr:`hbm_required_gb`."""
        return self.hbm_required_gb

    @property
    def is_loaded(self) -> bool:
        return self._loaded

    def load(self, engine: "InferenceEngine | None" = None) -> None:
        """Materialize parameters on device and compile programs."""
        self._engine = engine
        self._load()
        self._loaded = True

    def unload(self) -> None:
        """Drop device state so the HBM budget can be reclaimed."""
        if self._loaded:
            self._unload()
        self._loaded = False

    def _load(self) -> None:  # pragma: no cover - trivial default
        pass

    def _unload(self) -> None:  # pragma: no cover - trivial default
        pass

    def require_loaded(self) -> None:
        if not self._loaded:
            raise ModelNotLoadedError(
                f"{type(self).__name__} used before load()",
                context={"backend": type(self).__name__},
            )


class BaseASR(DeviceBackend):
    """Speech → transcript segments (optionally with word timings)."""

    @abstractmethod
    def transcribe(
        self, audio: "np.ndarray | str", sample_rate: int | None = None, **kw: Any
    ) -> list[TranscriptSegment]:
        ...

    def transcribe_with_words(
        self, audio: "np.ndarray | str", sample_rate: int | None = None, **kw: Any
    ) -> list[TranscriptSegment]:
        """Transcribe with word-level timestamps (default: same as transcribe)."""
        return self.transcribe(audio, sample_rate, word_timestamps=True, **kw)

    def transcribe_chunk_batch(
        self,
        chunks: "Iterable[np.ndarray]",
        sample_rate: int | None = None,
        pad_to: int | None = None,
        **kw: Any,
    ) -> list[list[TranscriptSegment]]:
        """Transcribe independent short chunks, one segment list per chunk.

        Device backends may override to run the whole batch as ONE
        dispatch (WhisperJaxASR rides its window-batch program — the
        streaming-mux path, ``asr/mux.py``; ``pad_to`` fixes the batch
        shape so the compiled-program set stays bounded). ``language``
        may be a per-chunk list (muxed sessions speak different
        languages). Default: per-chunk loop."""
        if isinstance(kw.get("language"), list):
            langs = kw.pop("language")
            return [self.transcribe(c, sample_rate, language=l, **kw)
                    for c, l in zip(chunks, langs)]
        return [self.transcribe(c, sample_rate, **kw) for c in chunks]


class BaseDiarizer(DeviceBackend):
    """Audio → speaker-labelled time segments."""

    @abstractmethod
    def diarize(
        self, audio: "np.ndarray | str", sample_rate: int | None = None, **kw: Any
    ) -> list[TranscriptSegment]:
        ...


class BaseChunker(ABC):
    """Transcript segments → retrieval chunks. Host-side, stateless."""

    @abstractmethod
    def chunk(self, segments: list[TranscriptSegment]) -> list[AudioChunk]:
        ...


class BaseEmbedder(DeviceBackend):
    """Text → dense (+ optional sparse) embeddings."""

    @abstractmethod
    def embed(self, texts: list[str]) -> list[EmbeddingResult]:
        ...

    def embed_query(self, query: str) -> EmbeddingResult:
        return self.embed([query])[0]


class BaseRetriever(DeviceBackend):
    """Vector store: add chunks, run dense/sparse/hybrid search."""

    @abstractmethod
    def add(
        self,
        chunks: list[AudioChunk],
        embeddings: list[EmbeddingResult],
        collection: str | None = None,
    ) -> int:
        ...

    @abstractmethod
    def search(
        self,
        query_embedding: EmbeddingResult,
        top_k: int = 5,
        search_type: str = "hybrid",
        collection: str | None = None,
        metadata_filter: dict[str, Any] | None = None,
    ) -> list[RetrievalResult]:
        ...

    @abstractmethod
    def count(self, collection: str | None = None) -> int:
        ...

    @abstractmethod
    def delete_collection(self, collection: str | None = None) -> bool:
        ...

    def collection_exists(self, collection: str | None = None) -> bool:
        try:
            return self.count(collection) >= 0
        except Exception:
            return False


class BaseReranker(DeviceBackend):
    """(query, candidates) → re-scored candidates."""

    @abstractmethod
    def rerank(
        self, query: str, results: list[RetrievalResult], top_k: int = 5
    ) -> list[RetrievalResult]:
        ...


class BaseGenerator(DeviceBackend):
    """Prompt → generated text (answer synthesis / HyDE / contextual headers)."""

    @abstractmethod
    def generate(
        self,
        prompt: str,
        system: str | None = None,
        max_tokens: int | None = None,
        temperature: float | None = None,
    ) -> str:
        ...

    def generate_stream(
        self,
        prompt: str,
        system: str | None = None,
        max_tokens: int | None = None,
        temperature: float | None = None,
    ) -> Iterable[str]:
        """Default streaming: yield the full completion once."""
        yield self.generate(
            prompt, system=system, max_tokens=max_tokens, temperature=temperature
        )

    def check_availability(self) -> bool:
        return True


class BaseTTS(DeviceBackend):
    """Text → waveform bytes."""

    @abstractmethod
    def synthesize(self, text: str, output_path: str | None = None) -> bytes:
        ...
