"""Streaming-session multiplexer: concurrent live sessions share one
window-batch ASR dispatch.

The reference serves ONE streaming session at a time — its WS handler
takes a process-wide lock (reference ``api/v1/streaming.py:26-230``)
because each chunk's transcription owns the GPU for 0.5–1.5 s. On TPU the
transcribe program is already batched over 30 s windows: a live chunk is
one row of a B-row program whose decode-loop weight reads — the
memory-bound term that dominates per-chunk latency — are shared across
rows, so N concurrent chunks cost barely more than one.

Built on :class:`~audio_rag_tpu.utils.coalescer.KeyedCoalescer` (shared
with the query path's :class:`~audio_rag_tpu.engine.query_coalescer.
QueryCoalescer`): chunks that arrive while a dispatch is in flight
accumulate and ride the next batch. All device work happens on the mux's
single thread, which also restores the one-device-writer invariant that
per-session worker threads would otherwise break when sharing one
backend.

Chunks batch only when their program-relevant parameters agree
(``word_timestamps`` / sample rate); mixed keys ship in consecutive
rounds. ``language`` is NOT part of the key: the language prompt token is
a runtime array, so sessions with different sticky languages share one
compiled program and one dispatch (per-row language tokens).
"""

from __future__ import annotations

import threading
from concurrent.futures import Future

import numpy as np

from audio_rag_tpu.utils.coalescer import KeyedCoalescer
from audio_rag_tpu.utils.logging import get_logger

log = get_logger(__name__)

__all__ = ["StreamingMux"]


class StreamingMux(KeyedCoalescer):
    """Batches concurrent sessions' chunks into one ASR dispatch."""

    worker_name = "asr-mux"
    join_timeout_s = 30.0

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
        self._ready_lock = threading.Lock()
        self.warmed = False
        super().__init__(
            max_batch=max_batch or getattr(
                backend.config, "window_batch_size", 8),
            linger_s=linger_ms / 1e3,
        )

    #: served-chunk counter under its domain name (base: items_served)
    @property
    def chunks_served(self) -> int:
        return self.items_served

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
        return self._submit((chunk, language),
                            (sample_rate, word_timestamps))

    # -- dispatch ----------------------------------------------------------
    def _run_batch(self, payloads: list, key: tuple):
        sample_rate, word_timestamps = key
        chunks = [chunk for chunk, _ in payloads]
        # per-chunk languages ride ONE dispatch (the language prompt
        # token is a runtime array, not part of program identity), so
        # sessions with different sticky languages still share a batch
        languages = [lang for _, lang in payloads]
        language = (languages[0] if len(set(languages)) == 1
                    else languages)
        # two batch buckets only ({1, max}): each distinct B is a
        # fresh transcribe program (minutes of trace+compile for
        # the real sizes), and pad rows are ~free — the decode
        # loop's weight reads are shared across rows. pad_to is
        # ALWAYS set: it also caps VAD span-splitting (a mid-chunk
        # pause would otherwise emit 2+ rows → an unwarmed bucket
        # → a minutes-long compile stalling every live session)
        return self.backend.transcribe_chunk_batch(
            chunks, sample_rate,
            word_timestamps=word_timestamps, language=language,
            pad_to=self.max_batch if len(chunks) > 1 else 1,
        )

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
