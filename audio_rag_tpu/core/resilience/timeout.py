"""Timeout helpers: async wrappers, thread-based sync timeouts, duration-scaled
per-operation budgets.

Parity: reference ``core/resilience/timeout.py:17-176``. The sync path uses a
worker thread + join (portable, works off the main thread) rather than
SIGALRM, which the reference uses and which breaks inside server threads.
"""

from __future__ import annotations

import asyncio
import concurrent.futures
import functools
from dataclasses import dataclass
from typing import Any, Awaitable, Callable, TypeVar

from audio_rag_tpu.core.exceptions import AudioRAGError

T = TypeVar("T")

__all__ = [
    "TimeoutError_",
    "TimeoutConfig",
    "async_timeout",
    "with_timeout",
    "sync_timeout",
    "calculate_asr_timeout",
    "calculate_diarization_timeout",
]


class TimeoutError_(AudioRAGError):
    """An operation exceeded its time budget."""


@dataclass
class TimeoutConfig:
    """Per-operation budgets (seconds). Reference timeout.py:30-57."""

    model_load: float = 300.0
    transcription_base: float = 60.0
    transcription_per_minute: float = 12.0
    diarization_base: float = 60.0
    diarization_per_minute: float = 8.0
    embedding: float = 120.0
    search: float = 30.0
    generation: float = 120.0
    default: float = 60.0


def calculate_asr_timeout(
    audio_duration_s: float, cfg: TimeoutConfig | None = None
) -> float:
    """Budget scaled by audio length (reference timeout.py:137-154)."""
    c = cfg or TimeoutConfig()
    return c.transcription_base + c.transcription_per_minute * (audio_duration_s / 60.0)


def calculate_diarization_timeout(
    audio_duration_s: float, cfg: TimeoutConfig | None = None
) -> float:
    c = cfg or TimeoutConfig()
    return c.diarization_base + c.diarization_per_minute * (audio_duration_s / 60.0)


async def async_timeout(
    coro: Awaitable[T], timeout: float, operation: str = "operation"
) -> T:
    try:
        return await asyncio.wait_for(coro, timeout=timeout)
    except asyncio.TimeoutError:
        raise TimeoutError_(
            f"{operation} timed out after {timeout:.1f}s",
            context={"operation": operation, "timeout": timeout},
        ) from None


_pool = concurrent.futures.ThreadPoolExecutor(max_workers=8,
                                              thread_name_prefix="timeout")


def sync_timeout(
    fn: Callable[..., T], timeout: float, *args: Any,
    operation: str = "operation", **kwargs: Any,
) -> T:
    """Run ``fn`` in a worker thread, abandoning it on timeout.

    The abandoned thread keeps running (Python cannot kill threads), but the
    caller regains control — acceptable for the I/O-ish operations this guards.
    """
    future = _pool.submit(fn, *args, **kwargs)
    try:
        return future.result(timeout=timeout)
    except concurrent.futures.TimeoutError:
        future.cancel()
        raise TimeoutError_(
            f"{operation} timed out after {timeout:.1f}s",
            context={"operation": operation, "timeout": timeout},
        ) from None


def with_timeout(
    timeout: float, operation: str | None = None
) -> Callable[[Callable[..., T]], Callable[..., T]]:
    """Decorator applying :func:`sync_timeout` (or asyncio for coroutines)."""

    def deco(fn: Callable[..., T]) -> Callable[..., T]:
        op = operation or fn.__name__
        if asyncio.iscoroutinefunction(fn):

            @functools.wraps(fn)
            async def awrapper(*args: Any, **kwargs: Any) -> Any:
                return await async_timeout(fn(*args, **kwargs), timeout, op)

            return awrapper  # type: ignore[return-value]

        @functools.wraps(fn)
        def wrapper(*args: Any, **kwargs: Any) -> T:
            return sync_timeout(fn, timeout, *args, operation=op, **kwargs)

        return wrapper

    return deco
