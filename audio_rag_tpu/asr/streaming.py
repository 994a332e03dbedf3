"""Real-time chunked streaming ASR.

Parity surface: reference ``asr/streaming.py:20-350`` — async ``AudioBuffer``
accumulating float32 PCM, 5 s chunks with 1 s overlap, state machine
IDLE → LISTENING → PROCESSING → STOPPED, sync + async stream iterators,
per-chunk ``StreamingResult`` with absolute timestamps.

TPU-first fix: the reference transcribes synchronously on the event loop
(``asr/streaming.py:292-297``, flagged in SURVEY.md §3.4); here device work
runs in a single worker thread so the asyncio loop never blocks, and chunk
mel/encoder compute reuses the batch backend's compiled programs.
"""

from __future__ import annotations

import asyncio
import concurrent.futures
import enum
import time
from dataclasses import dataclass, field
from typing import AsyncIterator, Iterator

import numpy as np

from audio_rag_tpu.asr.base import ASRRegistry
from audio_rag_tpu.config.schema import ASRConfig
from audio_rag_tpu.core.base import BaseASR
from audio_rag_tpu.core.types import TranscriptSegment, Word
from audio_rag_tpu.utils.logging import get_logger

log = get_logger(__name__)

__all__ = ["StreamingConfig", "StreamingResult", "StreamState",
           "AudioBuffer", "StreamingASR"]

SAMPLE_RATE = 16_000


@dataclass
class StreamingConfig:
    chunk_duration: float = 5.0
    overlap_duration: float = 1.0
    sample_rate: int = SAMPLE_RATE
    #: drop a chunk's transcript when its average logprob is below this
    min_avg_logprob: float | None = None
    #: decode budget per chunk: a 5 s chunk holds ~40 tokens of speech, so
    #: whisper's 224-token window budget wastes ~5× sequential decoder
    #: steps per chunk — the dominant per-chunk latency term
    max_decode_tokens: int = 64


@dataclass
class StreamingResult:
    text: str
    start: float
    end: float
    is_final: bool
    words: list[Word] = field(default_factory=list)
    processing_time_ms: float = 0.0

    def to_dict(self) -> dict:
        return {
            "text": self.text,
            "start": self.start,
            "end": self.end,
            "is_final": self.is_final,
            "words": [w.to_dict() for w in self.words],
            "processing_time_ms": self.processing_time_ms,
        }


class StreamState(str, enum.Enum):
    IDLE = "idle"
    LISTENING = "listening"
    PROCESSING = "processing"
    STOPPED = "stopped"


class AudioBuffer:
    """Lock-guarded float32 accumulator with absolute-time bookkeeping."""

    def __init__(self, sample_rate: int = SAMPLE_RATE):
        self.sample_rate = sample_rate
        self._chunks: list[np.ndarray] = []
        self._samples = 0
        #: seconds of audio already trimmed out of the buffer
        self.consumed_duration = 0.0
        self._lock = asyncio.Lock()

    @property
    def buffered_duration(self) -> float:
        return self._samples / self.sample_rate

    @property
    def total_duration(self) -> float:
        return self.consumed_duration + self.buffered_duration

    async def add(self, audio: np.ndarray) -> None:
        async with self._lock:
            self._add(audio)

    def _add(self, audio: np.ndarray) -> None:
        audio = np.asarray(audio, np.float32).reshape(-1)
        self._chunks.append(audio)
        self._samples += audio.size

    async def get_and_trim(self, keep_seconds: float) -> np.ndarray:
        async with self._lock:
            return self._get_and_trim(keep_seconds)

    def _get_and_trim(self, keep_seconds: float) -> np.ndarray:
        if not self._chunks:
            return np.zeros(0, np.float32)
        data = np.concatenate(self._chunks)
        keep = int(keep_seconds * self.sample_rate)
        if keep >= data.size:
            trimmed = np.zeros(0, np.float32)
        else:
            trimmed = data[: data.size - keep]
        self._chunks = [data[data.size - keep:]] if keep > 0 else []
        self._samples = min(keep, data.size)
        self.consumed_duration += trimmed.size / self.sample_rate
        return data

    async def reset(self) -> None:
        async with self._lock:
            self._chunks = []
            self._samples = 0
            self.consumed_duration = 0.0


@ASRRegistry.register("streaming-whisper")
class StreamingASR(BaseASR):
    """Chunked streaming wrapper over any batch ASR backend."""

    def __init__(
        self,
        config: ASRConfig | None = None,
        streaming: StreamingConfig | None = None,
        backend: BaseASR | None = None,
        mux=None,
    ):
        super().__init__()
        self.config = config or ASRConfig()
        self.streaming = streaming or StreamingConfig()
        if backend is None and mux is not None:
            backend = mux.backend
        if backend is None:
            from audio_rag_tpu.asr.whisper_jax import WhisperJaxASR

            # cap the per-chunk decode budget (compile-time static, so the
            # streaming programs are separate cache entries from batch ones)
            if self.config.max_decode_tokens is None:
                self.config = self.config.model_copy(update={
                    "max_decode_tokens": self.streaming.max_decode_tokens,
                })
            backend = WhisperJaxASR(self.config)
        self.backend = backend
        #: shared :class:`~audio_rag_tpu.asr.mux.StreamingMux` — when set,
        #: chunk transcription routes through it so concurrent sessions'
        #: chunks batch into one device dispatch (the backend is then
        #: shared across sessions and this wrapper never unloads it)
        self.mux = mux
        #: session-sticky language: seeded from config; when unset, the
        #: first muxed chunk's detected language sticks for the session
        #: (per-batch auto-detect costs an extra dispatch per round and a
        #: speaker doesn't change language mid-stream); cleared on reset()
        self._session_lang: str | None = self.config.language
        self.hbm_required_gb = backend.hbm_required_gb
        self.buffer = AudioBuffer(self.streaming.sample_rate)
        self.state = StreamState.IDLE
        # one worker thread: device work never blocks the event loop, and
        # serial submission preserves chunk order
        self._executor = concurrent.futures.ThreadPoolExecutor(
            max_workers=1, thread_name_prefix="stream-asr"
        )

    # -- lifecycle ---------------------------------------------------------
    def _load(self) -> None:
        if self.mux is not None:
            # shared backend: the mux serializes load across concurrent
            # sessions and warms the full serving program set ({1, max}
            # batch buckets)
            self.mux.ensure_ready(
                self._engine, self.streaming.sample_rate,
                self.streaming.chunk_duration)
            return
        if not self.backend.is_loaded:
            self.backend.load(self._engine)
        # prewarm the chunk-shaped program so the first live chunk doesn't
        # pay the compile (a real-time session can't absorb minutes)
        try:
            from audio_rag_tpu.audio.synth import speech_like

            n = int(self.streaming.chunk_duration
                    * self.streaming.sample_rate)
            # speech-shaped: noise/silence would be gated by the learned
            # VAD before ever compiling the decode program
            warm = speech_like(n, self.streaming.sample_rate, seed=0)
            self.backend.transcribe(warm, self.streaming.sample_rate,
                                    word_timestamps=True)
        except Exception as exc:
            log.warning("streaming prewarm skipped: %s", exc)

    def _unload(self) -> None:
        if self.mux is not None:
            return  # the shared backend outlives any one session
        self.backend.unload()

    async def start(self) -> None:
        self.require_loaded()
        await self.buffer.reset()
        self.state = StreamState.LISTENING

    async def stop(self) -> StreamingResult | None:
        """Flush whatever remains in the buffer as a final chunk."""
        self.state = StreamState.STOPPED
        remaining = await self.buffer.get_and_trim(0.0)
        if remaining.size < int(0.2 * self.streaming.sample_rate):
            return None
        return await self._transcribe_chunk_async(remaining, final=True)

    async def reset(self) -> None:
        await self.buffer.reset()
        self._session_lang = self.config.language
        self.state = StreamState.LISTENING

    # -- streaming ---------------------------------------------------------
    async def add_audio(self, audio: np.ndarray | bytes) -> StreamingResult | None:
        """Feed PCM (float32 array or int16 bytes); returns a result whenever
        a full chunk is ready."""
        if self.state not in (StreamState.LISTENING, StreamState.PROCESSING):
            return None
        if isinstance(audio, (bytes, bytearray)):
            audio = (
                np.frombuffer(audio, dtype="<i2").astype(np.float32) / 32768.0
            )
        await self.buffer.add(audio)
        if self.buffer.buffered_duration >= self.streaming.chunk_duration:
            self.state = StreamState.PROCESSING
            chunk = await self.buffer.get_and_trim(
                self.streaming.overlap_duration
            )
            result = await self._transcribe_chunk_async(chunk, final=False)
            if self.state is StreamState.PROCESSING:
                self.state = StreamState.LISTENING
            return result
        return None

    async def _transcribe_chunk_async(
        self, chunk: np.ndarray, final: bool
    ) -> StreamingResult:
        loop = asyncio.get_running_loop()
        # absolute start time of this chunk within the whole stream
        start = self.buffer.total_duration - len(chunk) / self.streaming.sample_rate
        return await loop.run_in_executor(
            self._executor, self._transcribe_chunk, chunk, max(start, 0.0), final
        )

    def _transcribe_chunk(
        self, chunk: np.ndarray, offset: float, final: bool
    ) -> StreamingResult:
        t0 = time.perf_counter()
        if self.mux is not None:
            # concurrent sessions' chunks coalesce into one window-batch
            # dispatch; this session's worker thread just waits on its row
            segments = self.mux.submit(
                chunk, self.streaming.sample_rate, word_timestamps=True,
                language=self._session_lang,
            ).result()
            if self._session_lang is None:
                for s in segments:
                    if s.language:  # detected once, sticky for the session
                        self._session_lang = s.language
                        break
        else:
            segments = self.backend.transcribe(
                chunk, self.streaming.sample_rate, word_timestamps=True
            )
        dt = (time.perf_counter() - t0) * 1000.0
        text = " ".join(s.text for s in segments).strip()
        words = [
            Word(w.text, round(w.start + offset, 3), round(w.end + offset, 3),
                 w.probability, w.speaker)
            for s in segments
            for w in s.words
        ]
        end = offset + len(chunk) / self.streaming.sample_rate
        return StreamingResult(
            text=text, start=round(offset, 3), end=round(end, 3),
            is_final=final, words=words, processing_time_ms=dt,
        )

    # -- batch-style iterators (reference process_stream, sync + async) ----
    def process_stream(
        self, audio: np.ndarray, sample_rate: int | None = None
    ) -> Iterator[StreamingResult]:
        """Replay a recorded array through the chunking state machine."""

        async def _run() -> list[StreamingResult]:
            out = []
            await self.start()
            step = int(0.5 * self.streaming.sample_rate)
            for i in range(0, len(audio), step):
                r = await self.add_audio(audio[i: i + step])
                if r is not None:
                    out.append(r)
            final = await self.stop()
            if final is not None:
                out.append(final)
            return out

        yield from asyncio.run(_run())

    async def process_stream_async(
        self, chunks: AsyncIterator[np.ndarray]
    ) -> AsyncIterator[StreamingResult]:
        await self.start()
        async for piece in chunks:
            r = await self.add_audio(piece)
            if r is not None:
                yield r
        final = await self.stop()
        if final is not None:
            yield final

    # batch interface passthrough
    def transcribe(self, audio, sample_rate=None, **kw) -> list[TranscriptSegment]:
        return self.backend.transcribe(audio, sample_rate, **kw)
