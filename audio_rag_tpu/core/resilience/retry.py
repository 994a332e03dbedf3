"""Retry with exponential backoff + jitter.

Parity: reference ``core/resilience/retry.py:35-189`` (tenacity-based
per-service decorators). Self-contained implementation: a deterministic,
injectable-clock :class:`RetryPolicy` plus decorator helpers for the common
service profiles (model load, store, network).
"""

from __future__ import annotations

import asyncio
import functools
import logging
import random
import time
from dataclasses import dataclass
from typing import Any, Callable, TypeVar

T = TypeVar("T")
log = logging.getLogger(__name__)

__all__ = [
    "RetryPolicy",
    "retry_with_backoff",
    "retry_model_load",
    "retry_store",
    "retry_network",
    "async_retry_with_backoff",
]


@dataclass
class RetryPolicy:
    max_attempts: int = 3
    base_delay: float = 0.5
    max_delay: float = 30.0
    exponential_base: float = 2.0
    jitter: float = 0.1  # fraction of delay added as uniform jitter
    retry_on: tuple[type[BaseException], ...] = (Exception,)

    def delay_for(self, attempt: int, rng: random.Random | None = None) -> float:
        """Backoff delay before attempt ``attempt`` (1-based, first retry = 1)."""
        d = min(self.base_delay * self.exponential_base ** (attempt - 1), self.max_delay)
        if self.jitter > 0:
            r = rng or random
            d += d * self.jitter * r.random()
        return d


def retry_with_backoff(
    policy: RetryPolicy | None = None,
    *,
    sleep: Callable[[float], None] = time.sleep,
    **policy_kw: Any,
) -> Callable[[Callable[..., T]], Callable[..., T]]:
    """Sync retry decorator. ``sleep`` is injectable for tests."""
    pol = policy or RetryPolicy(**policy_kw)

    def deco(fn: Callable[..., T]) -> Callable[..., T]:
        @functools.wraps(fn)
        def wrapper(*args: Any, **kwargs: Any) -> T:
            last: BaseException | None = None
            for attempt in range(1, pol.max_attempts + 1):
                try:
                    return fn(*args, **kwargs)
                except pol.retry_on as exc:
                    last = exc
                    if attempt == pol.max_attempts:
                        break
                    delay = pol.delay_for(attempt)
                    log.warning(
                        "%s failed (attempt %d/%d): %s — retrying in %.2fs",
                        fn.__name__, attempt, pol.max_attempts, exc, delay,
                    )
                    sleep(delay)
            assert last is not None
            raise last

        wrapper.retry_policy = pol  # type: ignore[attr-defined]
        return wrapper

    return deco


def async_retry_with_backoff(
    policy: RetryPolicy | None = None, **policy_kw: Any
) -> Callable[[Callable[..., Any]], Callable[..., Any]]:
    """Async retry decorator."""
    pol = policy or RetryPolicy(**policy_kw)

    def deco(fn: Callable[..., Any]) -> Callable[..., Any]:
        @functools.wraps(fn)
        async def wrapper(*args: Any, **kwargs: Any) -> Any:
            last: BaseException | None = None
            for attempt in range(1, pol.max_attempts + 1):
                try:
                    return await fn(*args, **kwargs)
                except pol.retry_on as exc:
                    last = exc
                    if attempt == pol.max_attempts:
                        break
                    await asyncio.sleep(pol.delay_for(attempt))
            assert last is not None
            raise last

        return wrapper

    return deco


# -- preconfigured profiles (reference: retry_model_load / retry_qdrant /
#    retry_network at core/resilience/retry.py:100-189) --------------------

def retry_model_load(fn: Callable[..., T]) -> Callable[..., T]:
    """Model load/compile: few attempts, long backoff (compiles are slow)."""
    return retry_with_backoff(
        RetryPolicy(max_attempts=2, base_delay=2.0, max_delay=60.0)
    )(fn)


def retry_store(fn: Callable[..., T]) -> Callable[..., T]:
    """Vector store / persistence operations."""
    return retry_with_backoff(
        RetryPolicy(max_attempts=3, base_delay=0.2, max_delay=5.0)
    )(fn)


def retry_network(fn: Callable[..., T]) -> Callable[..., T]:
    """External network calls (TTS backends, remote services)."""
    return retry_with_backoff(
        RetryPolicy(max_attempts=3, base_delay=0.5, max_delay=10.0)
    )(fn)
