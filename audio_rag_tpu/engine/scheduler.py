"""Generation scheduler: concurrent requests coalesce into batched decodes.

SURVEY.md §2.3 calls for "batched continuous decode shared by contextual/
HyDE/generation clients". On this runtime every device dispatch carries a
flat latency floor, so per-token slot admission (vLLM-style) would pay that
floor per token; the efficient shape is **wave batching**: requests arriving
within a short window (or until the batch fills) decode together as one
``generate_batch`` program, callers get futures. Contextual headers, HyDE
hypotheses and API answer requests all funnel through one scheduler, so
mixed workloads share device batches instead of serializing.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import Future
from dataclasses import dataclass, field
from typing import Any

from audio_rag_tpu.utils.logging import get_logger

log = get_logger(__name__)

__all__ = ["GenerationScheduler", "ScheduledGenerator"]


@dataclass
class _Request:
    prompt: str
    system: str | None
    max_tokens: int | None
    temperature: float | None
    future: Future = field(default_factory=Future)

    def batch_key(self) -> tuple:
        """Requests batch together only when decode params agree."""
        return (self.system, self.max_tokens, self.temperature)


class GenerationScheduler:
    def __init__(
        self,
        generator,  # object with generate_batch(prompts, ...)
        max_batch: int = 16,
        max_wait_ms: float = 10.0,
    ):
        self.generator = generator
        self.max_batch = max_batch
        self.max_wait_s = max_wait_ms / 1000.0
        self._queue: "queue.Queue[_Request | None]" = queue.Queue()
        self._thread = threading.Thread(
            target=self._run, name="gen-scheduler", daemon=True
        )
        self._stopped = False
        self._thread.start()
        self.batches_run = 0
        self.requests_served = 0

    # -- client API --------------------------------------------------------
    def submit(
        self,
        prompt: str,
        system: str | None = None,
        max_tokens: int | None = None,
        temperature: float | None = None,
    ) -> Future:
        if self._stopped:
            raise RuntimeError("scheduler stopped")
        req = _Request(prompt, system, max_tokens, temperature)
        self._queue.put(req)
        return req.future

    def generate(self, prompt: str, **kw: Any) -> str:
        """Blocking convenience wrapper."""
        return self.submit(prompt, **kw).result()

    def stop(self) -> None:
        self._stopped = True
        self._queue.put(None)
        self._thread.join(timeout=5.0)

    # -- worker ------------------------------------------------------------
    def _collect_wave(self) -> list[_Request] | None:
        first = self._queue.get()
        if first is None:
            return None
        wave = [first]
        key = first.batch_key()
        deadline = self.max_wait_s
        while len(wave) < self.max_batch:
            try:
                nxt = self._queue.get(timeout=deadline)
            except queue.Empty:
                break
            if nxt is None:
                self._queue.put(None)  # re-signal stop for the outer loop
                break
            if nxt.batch_key() != key:
                # different decode params: run it in the next wave
                self._queue.put(nxt)
                break
            wave.append(nxt)
        return wave

    def _run(self) -> None:
        while True:
            wave = self._collect_wave()
            if wave is None:
                return
            try:
                results = self.generator.generate_batch(
                    [r.prompt for r in wave],
                    system=wave[0].system,
                    max_tokens=wave[0].max_tokens,
                    temperature=wave[0].temperature,
                )
                for r, text in zip(wave, results):
                    r.future.set_result(text)
            except Exception as exc:
                log.error("generation wave failed: %s", exc)
                for r in wave:
                    if not r.future.done():
                        r.future.set_exception(exc)
            self.batches_run += 1
            self.requests_served += len(wave)


class ScheduledGenerator:
    """BaseGenerator-shaped adapter routing through a scheduler.

    Wraps a loaded generator so pipeline components (contextual, HyDE,
    query answers) transparently share device batches.
    """

    def __init__(self, generator, max_batch: int = 16,
                 max_wait_ms: float = 10.0, mode: str = "wave",
                 n_slots: int = 8, segment_tokens: int = 16,
                 context_tokens: int = 2048,
                 idle_segment_tokens: int = 0):
        self.inner = generator
        if mode == "continuous":
            from audio_rag_tpu.engine.continuous import ContinuousBatcher

            self.scheduler = ContinuousBatcher(
                generator, n_slots=n_slots, segment_tokens=segment_tokens,
                context_tokens=context_tokens,
                idle_segment_tokens=idle_segment_tokens)
        else:
            self.scheduler = GenerationScheduler(generator, max_batch,
                                                 max_wait_ms)

    @property
    def is_loaded(self) -> bool:
        return getattr(self.inner, "is_loaded", True)

    def load(self, engine=None) -> None:
        if hasattr(self.inner, "load") and not self.inner.is_loaded:
            self.inner.load(engine)

    def unload(self) -> None:
        self.scheduler.stop()
        if hasattr(self.inner, "unload"):
            self.inner.unload()

    def check_availability(self) -> bool:
        return getattr(self.inner, "check_availability", lambda: True)()

    def generate(self, prompt: str, system: str | None = None,
                 max_tokens: int | None = None,
                 temperature: float | None = None) -> str:
        return self.scheduler.generate(
            prompt, system=system, max_tokens=max_tokens,
            temperature=temperature,
        )

    def generate_batch(self, prompts: list[str], **kw: Any) -> list[str]:
        futures = [self.scheduler.submit(p, **kw) for p in prompts]
        return [f.result() for f in futures]

    def generate_stream(self, prompt: str, **kw: Any):
        """Token-level streaming when the continuous batcher is active
        (deltas arrive as decode segments complete — the reference's
        Ollama NDJSON streaming, ``generation/ollama.py:98-130``); chunked
        post-hoc streaming under wave batching."""
        from audio_rag_tpu.engine.continuous import ContinuousBatcher

        if isinstance(self.scheduler, ContinuousBatcher):
            import queue as _q

            deltas: "_q.Queue[str | None]" = _q.Queue()
            fut = self.scheduler.submit(
                prompt, on_delta=deltas.put, **kw)
            fut.add_done_callback(lambda _: deltas.put(None))
            while True:
                d = deltas.get()
                if d is None:
                    break
                yield d
            fut.result()  # surface errors
            return
        text = self.generate(prompt, **kw)
        words = text.split()
        for i in range(0, len(words), 8):
            yield " ".join(words[i: i + 8]) + " "
