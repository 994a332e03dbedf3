"""Three-state circuit breaker (CLOSED → OPEN → HALF_OPEN).

Parity: reference ``core/resilience/circuit_breaker.py:16-273`` (state
machine, stats, sync+async call wrappers, decorator form). This is the single
canonical implementation — the reference's second, queue-local breaker
(``queue/connection.py:39-130``) is replaced by reusing this one.
"""

from __future__ import annotations

import enum
import functools
import threading
import time
from dataclasses import dataclass, field
from typing import Any, Awaitable, Callable, TypeVar

from audio_rag_tpu.core.exceptions import AudioRAGError

T = TypeVar("T")

__all__ = [
    "CircuitState",
    "CircuitBreakerConfig",
    "CircuitBreakerOpenError",
    "CircuitStats",
    "CircuitBreaker",
    "circuit_breaker",
]


class CircuitState(str, enum.Enum):
    CLOSED = "closed"
    OPEN = "open"
    HALF_OPEN = "half_open"


class CircuitBreakerOpenError(AudioRAGError):
    """Raised when a call is rejected because the breaker is open."""


@dataclass
class CircuitBreakerConfig:
    failure_threshold: int = 5
    #: consecutive successes required in HALF_OPEN to close
    success_threshold: int = 2
    #: seconds the breaker stays OPEN before probing
    recovery_timeout: float = 30.0
    #: exception types counted as failures
    expected_exceptions: tuple[type[BaseException], ...] = (Exception,)


@dataclass
class CircuitStats:
    total_calls: int = 0
    total_failures: int = 0
    total_successes: int = 0
    total_rejected: int = 0
    consecutive_failures: int = 0
    consecutive_successes: int = 0
    last_failure_time: float | None = None
    state_changes: list[tuple[float, str]] = field(default_factory=list)


class CircuitBreaker:
    """Thread-safe breaker usable as object, decorator, or async wrapper."""

    def __init__(
        self,
        name: str = "default",
        config: CircuitBreakerConfig | None = None,
        clock: Callable[[], float] = time.monotonic,
    ):
        self.name = name
        self.config = config or CircuitBreakerConfig()
        self._clock = clock
        self._state = CircuitState.CLOSED
        self._opened_at: float | None = None
        self._lock = threading.Lock()
        self.stats = CircuitStats()

    # -- state machine ----------------------------------------------------
    @property
    def state(self) -> CircuitState:
        with self._lock:
            self._maybe_half_open()
            return self._state

    def _maybe_half_open(self) -> None:
        if (
            self._state is CircuitState.OPEN
            and self._opened_at is not None
            and self._clock() - self._opened_at >= self.config.recovery_timeout
        ):
            self._transition(CircuitState.HALF_OPEN)

    def _transition(self, new: CircuitState) -> None:
        if new is not self._state:
            self._state = new
            self.stats.state_changes.append((self._clock(), new.value))
            if new is CircuitState.OPEN:
                self._opened_at = self._clock()
            if new is CircuitState.CLOSED:
                self.stats.consecutive_failures = 0

    def _before_call(self) -> None:
        with self._lock:
            self._maybe_half_open()
            if self._state is CircuitState.OPEN:
                self.stats.total_rejected += 1
                raise CircuitBreakerOpenError(
                    f"circuit {self.name!r} is open",
                    context={"breaker": self.name, "state": self._state.value},
                )
            self.stats.total_calls += 1

    def record_success(self) -> None:
        with self._lock:
            self.stats.total_successes += 1
            self.stats.consecutive_successes += 1
            self.stats.consecutive_failures = 0
            if (
                self._state is CircuitState.HALF_OPEN
                and self.stats.consecutive_successes >= self.config.success_threshold
            ):
                self._transition(CircuitState.CLOSED)

    def record_failure(self) -> None:
        with self._lock:
            self.stats.total_failures += 1
            self.stats.consecutive_failures += 1
            self.stats.consecutive_successes = 0
            self.stats.last_failure_time = self._clock()
            if self._state is CircuitState.HALF_OPEN:
                self._transition(CircuitState.OPEN)
            elif (
                self._state is CircuitState.CLOSED
                and self.stats.consecutive_failures >= self.config.failure_threshold
            ):
                self._transition(CircuitState.OPEN)

    def reset(self) -> None:
        with self._lock:
            self._transition(CircuitState.CLOSED)
            self.stats.consecutive_failures = 0
            self.stats.consecutive_successes = 0

    # -- call wrappers ----------------------------------------------------
    def call(self, fn: Callable[..., T], *args: Any, **kwargs: Any) -> T:
        self._before_call()
        try:
            result = fn(*args, **kwargs)
        except self.config.expected_exceptions:
            self.record_failure()
            raise
        self.record_success()
        return result

    async def call_async(
        self, fn: Callable[..., Awaitable[T]], *args: Any, **kwargs: Any
    ) -> T:
        self._before_call()
        try:
            result = await fn(*args, **kwargs)
        except self.config.expected_exceptions:
            self.record_failure()
            raise
        self.record_success()
        return result

    def __call__(self, fn: Callable[..., T]) -> Callable[..., T]:
        @functools.wraps(fn)
        def wrapper(*args: Any, **kwargs: Any) -> T:
            return self.call(fn, *args, **kwargs)

        return wrapper


def circuit_breaker(
    name: str = "default", **config_kw: Any
) -> Callable[[Callable[..., T]], Callable[..., T]]:
    """Decorator form: ``@circuit_breaker("vecstore", failure_threshold=3)``."""
    breaker = CircuitBreaker(name, CircuitBreakerConfig(**config_kw))

    def deco(fn: Callable[..., T]) -> Callable[..., T]:
        wrapped = breaker(fn)
        wrapped.breaker = breaker  # type: ignore[attr-defined]
        return wrapped

    return deco
