"""Ingestion pipeline: audio → transcript → chunks → embeddings → store.

Parity surface: reference ``pipeline/ingestion.py:21-213`` — the 6-step
ingest (transcribe → diarize → align → chunk → contextualize → embed+store)
with lazy component properties, per-step resource budgeting, and source
metadata stamping on every chunk.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, Callable

import numpy as np

from audio_rag_tpu.alignment.aligner import (
    align_words_to_speakers,
    build_speaker_transcript,
)
from audio_rag_tpu.asr.base import ASRRegistry
from audio_rag_tpu.chunking.base import ChunkingRegistry
from audio_rag_tpu.config.schema import AudioRAGConfig
from audio_rag_tpu.contextual.processor import ContextualProcessor
from audio_rag_tpu.core.types import AudioChunk, TranscriptSegment
from audio_rag_tpu.diarization.base import DiarizationRegistry
from audio_rag_tpu.embeddings.base import EmbeddingsRegistry
from audio_rag_tpu.generation.base import create_generator
from audio_rag_tpu.retrieval.base import RetrievalRegistry
from audio_rag_tpu.utils.decorators import timed
from audio_rag_tpu.utils.logging import get_logger
from audio_rag_tpu.utils.tracing import span

log = get_logger(__name__)

__all__ = ["IngestionPipeline", "IngestionResult"]


@dataclass
class IngestionResult:
    source: str
    collection: str
    num_segments: int
    num_chunks: int
    num_speakers: int
    duration_s: float
    elapsed_s: float
    stage_timings: dict[str, float] = field(default_factory=dict)

    def to_dict(self) -> dict[str, Any]:
        return {
            "source": self.source,
            "collection": self.collection,
            "num_segments": self.num_segments,
            "num_chunks": self.num_chunks,
            "num_speakers": self.num_speakers,
            "duration_s": self.duration_s,
            "elapsed_s": self.elapsed_s,
            "stage_timings": self.stage_timings,
        }


class IngestionPipeline:
    """Lazily builds components from registries (reference ingestion.py:45-90)."""

    def __init__(
        self,
        config: AudioRAGConfig,
        embedder=None,
        retriever=None,
        generator=None,
        progress_callback: Callable[[str, float], None] | None = None,
    ):
        self.config = config
        self._asr = None
        self._diarizer = None
        self._chunker = None
        self._embedder = embedder
        self._retriever = retriever
        self._generator = generator
        self._contextual = None
        self.progress_callback = progress_callback

    # -- lazy components ---------------------------------------------------
    @property
    def asr(self):
        if self._asr is None:
            self._asr = ASRRegistry.create(self.config.asr.backend,
                                           self.config.asr)
        if not self._asr.is_loaded:
            self._asr.load()
        return self._asr

    @property
    def diarizer(self):
        if self._diarizer is None:
            self._diarizer = DiarizationRegistry.create(
                self.config.diarization.backend, self.config.diarization
            )
        if not self._diarizer.is_loaded:
            self._diarizer.load()
        return self._diarizer

    @property
    def chunker(self):
        if self._chunker is None:
            self._chunker = ChunkingRegistry.create(
                self.config.chunking.strategy, self.config.chunking
            )
        return self._chunker

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
    def contextual(self):
        if self._contextual is None:
            generator = self._generator
            if generator is None and self.config.contextual.enabled:
                generator = create_generator(self.config.generation)
                if generator is not None and not generator.is_loaded:
                    generator.load()
                self._generator = generator
            self._contextual = ContextualProcessor(
                self.config.contextual, generator
            )
        return self._contextual

    def _progress(self, stage: str, frac: float) -> None:
        if self.progress_callback:
            try:
                self.progress_callback(stage, frac)
            except Exception:
                pass

    # -- main entry --------------------------------------------------------
    @timed
    def ingest(
        self,
        audio: str | Path | np.ndarray,
        sample_rate: int | None = None,
        collection: str | None = None,
        diarize: bool = True,
        metadata: dict[str, Any] | None = None,
        checkpoint_cb: Callable[[str, dict[str, Any]], None] | None = None,
        resume: dict[str, Any] | None = None,
    ) -> IngestionResult:
        """Run the 6-stage ingest.

        ``checkpoint_cb(stage, data)`` fires after each completed stage with
        JSON-serializable artifacts; ``resume`` (a previous checkpoint's
        ``{"stage": ..., "segments"/"chunks": ...}``) skips already-completed
        stages — the stage checkpointing the reference designed but never
        wired (``queue/worker.py:432``).
        """
        t_start = time.perf_counter()
        timings: dict[str, float] = {}
        source = str(audio) if not isinstance(audio, np.ndarray) else "<array>"
        collection = collection or self.config.retrieval.collection_name

        def clock(name: str, t0: float) -> float:
            timings[name] = round(time.perf_counter() - t0, 3)
            return time.perf_counter()

        def ckpt(stage: str, data: dict[str, Any]) -> None:
            if checkpoint_cb:
                try:
                    checkpoint_cb(stage, data)
                except Exception as exc:
                    log.warning("checkpoint %s failed: %s", stage, exc)

        resume_stage = (resume or {}).get("stage")
        segments: list[TranscriptSegment] = []
        chunks: list[AudioChunk] = []
        if resume_stage in ("transcribed", "aligned"):
            segments = [
                TranscriptSegment.from_dict(d) for d in resume["segments"]
            ]
        if resume_stage in ("chunked", "contextualized"):
            chunks = [AudioChunk.from_dict(d) for d in resume["chunks"]]

        t0 = time.perf_counter()
        if not segments and not chunks:
            # 1. transcribe (words needed for alignment)
            self._progress("transcribing", 0.0)
            with span("ingest.transcribe"):
                segments = self.asr.transcribe_with_words(audio, sample_rate)
            t0 = clock("transcribe", t0)
            if not segments:
                return IngestionResult(
                    source=source, collection=collection, num_segments=0,
                    num_chunks=0, num_speakers=0, duration_s=0.0,
                    elapsed_s=round(time.perf_counter() - t_start, 3),
                    stage_timings=timings,
                )

            # 2-3. diarize + align
            if diarize:
                self._progress("diarizing", 0.2)
                with span("ingest.diarize"):
                    diar = self.diarizer.diarize(audio, sample_rate)
                t0 = clock("diarize", t0)
                self._progress("aligning", 0.4)
                words = [w for s in segments for w in s.words]
                aligned = align_words_to_speakers(
                    words, diar, self.config.alignment.tolerance_s
                )
                segments = build_speaker_transcript(aligned)
                t0 = clock("align", t0)
            ckpt("aligned", {"segments": [s.to_dict() for s in segments]})

        if not chunks:
            # 4. chunk
            self._progress("chunking", 0.5)
            chunks = self.chunker.chunk(segments)
            t0 = clock("chunk", t0)

            # 5. contextual headers (optional)
            if self.config.contextual.enabled:
                self._progress("contextualizing", 0.6)
                chunks = self.contextual.process_chunks(chunks)
                t0 = clock("contextualize", t0)
            ckpt("contextualized" if self.config.contextual.enabled
                 else "chunked",
                 {"chunks": [c.to_dict() for c in chunks]})

        # stamp source metadata (reference ingestion.py:150-159)
        meta = {"source": source, **(metadata or {})}
        for c in chunks:
            c.metadata.update(meta)

        # 6. embed + store
        self._progress("embedding", 0.7)
        with span("ingest.embed"):
            embeddings = self.embedder.embed([c.text for c in chunks])
        t0 = clock("embed", t0)
        self._progress("indexing", 0.9)
        with span("ingest.index"):
            self.retriever.add(chunks, embeddings, collection)
        clock("index", t0)
        self._progress("done", 1.0)

        speakers = {s.speaker for s in segments if s.speaker} or {
            c.speaker for c in chunks if c.speaker
        }
        duration = max(
            (s.end for s in segments),
            default=max((c.end for c in chunks), default=0.0),
        )
        return IngestionResult(
            source=source,
            collection=collection,
            num_segments=len(segments),
            num_chunks=len(chunks),
            num_speakers=len(speakers),
            duration_s=round(duration, 3),
            elapsed_s=round(time.perf_counter() - t_start, 3),
            stage_timings=timings,
        )

    def ingest_batch(
        self,
        audios: list[str | Path],
        collection: str | None = None,
        metadatas: list[dict[str, Any] | None] | None = None,
        **kw: Any,
    ) -> list[IngestionResult]:
        """Batch ingest, STAGE-GROUPED when contextual headers are on.

        ``metadatas`` optionally gives each file its own metadata dict
        (the job-queue worker stamps per-job tenant ids); ``metadata``
        in ``**kw`` applies to every file.

        The per-file loop pays two HBM model swaps per file under a
        single-chip budget (whisper+diarizer evicted for the header LLM,
        then reloaded for the next file's ASR — seconds each, measured
        inside bench_ingest.py's contextualize stage). Grouping by stage
        runs every file's audio stages while the ASR models are
        resident, then every file's headers with the LLM loaded ONCE,
        then embeds+stores — 2 swaps per BATCH instead of per file.
        Identical outputs to the per-file loop: headers only read
        same-file neighbor chunks, and files embed/store in order.

        Per-file semantics (checkpoint_cb/resume) route to the per-file
        loop — the job queue processes one file per job and owns those.
        """
        if (len(audios) <= 1 or not self.config.contextual.enabled
                or kw.get("checkpoint_cb") or kw.get("resume")):
            metas = metadatas or [None] * len(audios)
            return [
                self.ingest(a, collection=collection,
                            **{**kw, "metadata": {
                                **(kw.get("metadata") or {}),
                                **(m or {})}})
                for a, m in zip(audios, metas)
            ]

        sample_rate = kw.get("sample_rate")
        diarize = kw.get("diarize", True)
        metadata = kw.get("metadata")
        collection = collection or self.config.retrieval.collection_name

        # pass 1: transcribe → diarize → align → chunk (ASR resident)
        staged: list[dict[str, Any]] = []
        for audio in audios:
            t_start = time.perf_counter()
            timings: dict[str, float] = {}
            source = (str(audio) if not isinstance(audio, np.ndarray)
                      else "<array>")
            t0 = time.perf_counter()
            with span("ingest.transcribe"):
                segments = self.asr.transcribe_with_words(audio, sample_rate)
            timings["transcribe"] = round(time.perf_counter() - t0, 3)
            t0 = time.perf_counter()
            if segments and diarize:
                with span("ingest.diarize"):
                    diar = self.diarizer.diarize(audio, sample_rate)
                timings["diarize"] = round(time.perf_counter() - t0, 3)
                t0 = time.perf_counter()
                words = [w for s in segments for w in s.words]
                aligned = align_words_to_speakers(
                    words, diar, self.config.alignment.tolerance_s
                )
                segments = build_speaker_transcript(aligned)
                timings["align"] = round(time.perf_counter() - t0, 3)
                t0 = time.perf_counter()
            chunks = self.chunker.chunk(segments) if segments else []
            timings["chunk"] = round(time.perf_counter() - t0, 3)
            staged.append({
                "source": source, "segments": segments, "chunks": chunks,
                "timings": timings, "t_start": t_start,
            })

        # pass 2: contextual headers for every file, LLM loaded once
        for st in staged:
            if not st["chunks"]:
                continue
            t0 = time.perf_counter()
            with span("ingest.contextualize"):
                st["chunks"] = self.contextual.process_chunks(st["chunks"])
            st["timings"]["contextualize"] = round(
                time.perf_counter() - t0, 3)

        # pass 3: embed + store (header LLM can now yield to the embedder)
        results = []
        for idx, st in enumerate(staged):
            segments, chunks = st["segments"], st["chunks"]
            per_file = (metadatas[idx] if metadatas else None) or {}
            meta = {"source": st["source"], **(metadata or {}), **per_file}
            for c in chunks:
                c.metadata.update(meta)
            t0 = time.perf_counter()
            if chunks:
                with span("ingest.embed"):
                    embeddings = self.embedder.embed(
                        [c.text for c in chunks])
                st["timings"]["embed"] = round(time.perf_counter() - t0, 3)
                t0 = time.perf_counter()
                with span("ingest.index"):
                    self.retriever.add(chunks, embeddings, collection)
                st["timings"]["index"] = round(time.perf_counter() - t0, 3)
            speakers = {s.speaker for s in segments if s.speaker} or {
                c.speaker for c in chunks if c.speaker
            }
            results.append(IngestionResult(
                source=st["source"],
                collection=collection,
                num_segments=len(segments),
                num_chunks=len(chunks),
                num_speakers=len(speakers),
                duration_s=round(max(
                    (s.end for s in segments),
                    default=max((c.end for c in chunks), default=0.0),
                ), 3),
                elapsed_s=round(time.perf_counter() - st["t_start"], 3),
                stage_timings=st["timings"],
            ))
        return results

    # transcript-only ingest for pre-transcribed corpora (eval harness)
    def ingest_segments(
        self,
        segments: list[TranscriptSegment],
        collection: str | None = None,
        metadata: dict[str, Any] | None = None,
        source: str = "<segments>",
    ) -> IngestionResult:
        t_start = time.perf_counter()
        collection = collection or self.config.retrieval.collection_name
        chunks = self.chunker.chunk(segments)
        if self.config.contextual.enabled:
            chunks = self.contextual.process_chunks(chunks)
        meta = {"source": source, **(metadata or {})}
        for c in chunks:
            c.metadata.update(meta)
        embeddings = self.embedder.embed([c.text for c in chunks])
        self.retriever.add(chunks, embeddings, collection)
        speakers = {s.speaker for s in segments if s.speaker}
        return IngestionResult(
            source=source, collection=collection,
            num_segments=len(segments), num_chunks=len(chunks),
            num_speakers=len(speakers),
            duration_s=round(max((s.end for s in segments), default=0.0), 3),
            elapsed_s=round(time.perf_counter() - t_start, 3),
        )
