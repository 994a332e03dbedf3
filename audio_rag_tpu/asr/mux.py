"""Streaming-session multiplexer: concurrent live sessions share one
window-batch ASR dispatch.

The reference serves ONE streaming session at a time — its WS handler
takes a process-wide lock (reference ``api/v1/streaming.py:26-230``)
because each chunk's transcription owns the GPU for 0.5–1.5 s. On TPU the
transcribe program is already batched over 30 s windows: a live chunk is
one row of a B-row program whose decode-loop weight reads — the
memory-bound term that dominates per-chunk latency — are shared across
rows, so N concurrent chunks cost barely more than one.

This is the ASR analog of :class:`~audio_rag_tpu.engine.query_coalescer.
QueryCoalescer`: chunks that arrive while a dispatch is in flight
accumulate and ride the next batch (continuous-batching style — no
artificial wait window; the in-flight dispatch IS the window). All device
work happens on the mux's single thread, which also restores the
one-device-writer invariant that per-session worker threads would
otherwise break when sharing one backend.

Chunks batch only when their decode-relevant parameters agree
(``word_timestamps`` / ``language`` / sample rate — they select the
compiled program and the prompt); mixed keys ship in consecutive rounds.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import Future
from dataclasses import dataclass, field

import numpy as np

from audio_rag_tpu.core.types import TranscriptSegment
from audio_rag_tpu.utils.logging import get_logger

log = get_logger(__name__)

__all__ = ["StreamingMux"]


@dataclass
class _Pending:
    chunk: np.ndarray
    key: tuple  # (sample_rate, word_timestamps, language)
    future: Future = field(default_factory=Future)


class StreamingMux:
    """Batches concurrent sessions' chunks into one ASR dispatch."""

    def __init__(self, backend, max_batch: int | None = None,
                 linger_ms: float = 8.0):
        """``backend`` is any loaded :class:`BaseASR`; WhisperJaxASR
        overrides ``transcribe_chunk_batch`` to run the batch as one
        device program, other backends fall back to a per-chunk loop.

        ``linger_ms``: after the first chunk of a round, keep draining
        until no new chunk has arrived for this long (up to
        ``max_batch``). Without it, batches under-fill by a measured
        2×: when a dispatch completes, ALL waiting sessions wake at
        once, but the single host CPU resumes them one at a time — the
        first resubmission would ship alone (or as a pair) while the
        other sessions are still stitching their previous result, and
        the padded dispatch costs the full max_batch price regardless
        (B=8 chunk dispatch ≈ 871 ms vs 297 single, ~71 ms marginal
        per REAL row — see bench_streaming.py BENCH_SESSIONS). A few
        ms of linger per dispatch is noise against a live session's
        chunk cadence (seconds)."""
        self.backend = backend
        self.max_batch = max_batch or getattr(
            backend.config, "window_batch_size", 8)
        self.linger_s = linger_ms / 1e3
        self._ready_lock = threading.Lock()
        self._queue: "queue.Queue[_Pending | None]" = queue.Queue()
        self._stopped = False
        self.batches_run = 0
        self.chunks_served = 0
        self.warmed = False
        self._thread = threading.Thread(
            target=self._loop, name="asr-mux", daemon=True)
        self._thread.start()

    # -- client API ------------------------------------------------------
    def submit(
        self,
        chunk: np.ndarray,
        sample_rate: int | None = None,
        word_timestamps: bool = False,
        language: str | None = None,
    ) -> Future:
        """Enqueue one chunk; the future resolves to its
        ``list[TranscriptSegment]`` (chunk-relative timestamps)."""
        if self._stopped:
            raise RuntimeError("mux stopped")
        p = _Pending(chunk, (sample_rate, word_timestamps, language))
        self._queue.put(p)
        return p.future

    def stop(self) -> None:
        self._stopped = True
        self._queue.put(None)
        self._thread.join(timeout=30.0)
        # fail stragglers that raced the stop flag instead of leaving
        # their futures hanging forever
        while True:
            try:
                p = self._queue.get_nowait()
            except queue.Empty:
                break
            if p is not None and not p.future.done():
                p.future.set_exception(RuntimeError("mux stopped"))

    # -- worker ------------------------------------------------------------
    def _loop(self) -> None:
        while True:
            item = self._queue.get()
            if item is None:
                return
            batch = [item]
            # drain whatever accumulated while the previous batch ran,
            # lingering linger_s past the last arrival so simultaneously
            # woken sessions (serialized by the single host CPU) all make
            # the batch; only same-key chunks ride together, the rest
            # requeue (each round ships one key group, so no key can
            # starve another)
            requeue = []
            while len(batch) < self.max_batch:
                try:
                    nxt = self._queue.get(timeout=self.linger_s)
                except queue.Empty:
                    break
                if nxt is None:
                    self._queue.put(None)
                    break
                if nxt.key == item.key:
                    batch.append(nxt)
                else:
                    requeue.append(nxt)
            for p in requeue:
                self._queue.put(p)

            sample_rate, word_timestamps, language = item.key
            try:
                # two batch buckets only ({1, max}): each distinct B is a
                # fresh transcribe program (minutes of trace+compile for
                # the real sizes), and pad rows are ~free — the decode
                # loop's weight reads are shared across rows. pad_to is
                # ALWAYS set: it also caps VAD span-splitting (a mid-chunk
                # pause would otherwise emit 2+ rows → an unwarmed bucket
                # → a minutes-long compile stalling every live session)
                results = self.backend.transcribe_chunk_batch(
                    [p.chunk for p in batch], sample_rate,
                    word_timestamps=word_timestamps, language=language,
                    pad_to=self.max_batch if len(batch) > 1 else 1,
                )
            except Exception as exc:
                for p in batch:
                    if not p.future.done():
                        p.future.set_exception(exc)
                continue
            self.batches_run += 1
            self.chunks_served += len(batch)
            for p, segs in zip(batch, results):
                if not p.future.done():
                    p.future.set_result(segs)

    # -- load + warmup -------------------------------------------------------
    def ensure_ready(self, engine=None, sample_rate: int = 16000,
                     chunk_seconds: float = 5.0,
                     word_timestamps: bool = True) -> None:
        """Load the shared backend and compile the EXACT serving program
        set — batch buckets {1, max_batch} — exactly once, before live
        traffic.

        Concurrent sessions' ``load()`` calls serialize here: without the
        lock, two connections arriving at process start would both see
        ``is_loaded == False`` and race ``backend.load()`` on the SAME
        instance (double HBM allocation, duplicate ~minutes trace). The
        B=max_batch warm matters as much as B=1: the first time two live
        sessions coalesce, the padded dispatch is a fresh program — the
        mux's single worker thread would block in a minutes-long compile
        with EVERY session's chunks queued behind it.

        Direct backend calls (not ``submit``) are safe here: no session
        streams before its ``ensure_ready`` returns, so the mux thread is
        idle during the first warm; afterwards the flag short-circuits.
        """
        with self._ready_lock:
            if not self.backend.is_loaded:
                self.backend.load(engine)
            if self.warmed:
                return
            # mark attempted BEFORE running: if warm fails, the session
            # streams anyway (load() didn't raise) and a LATER session's
            # retry would drive the backend directly while the mux thread
            # dispatches live chunks — two device writers. Failed warm
            # degrades to compile-on-first-use on the mux thread (slow but
            # single-writer-safe), never to a concurrent retry.
            self.warmed = True
            try:
                from audio_rag_tpu.audio.synth import speech_like

                warm = speech_like(
                    int(chunk_seconds * sample_rate), sample_rate, seed=0)
                self.backend.transcribe_chunk_batch(
                    [warm], sample_rate, word_timestamps=word_timestamps,
                    pad_to=1)
                if self.max_batch > 1:
                    self.backend.transcribe_chunk_batch(
                        [warm, warm], sample_rate,
                        word_timestamps=word_timestamps,
                        pad_to=self.max_batch)
            except Exception as exc:  # pragma: no cover - best-effort
                log.warning("mux warmup failed (first live batches will "
                            "compile on the mux thread): %s", exc)
