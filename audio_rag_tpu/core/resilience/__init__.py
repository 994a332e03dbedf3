"""Resilience primitives: circuit breaker, retry, fallback chains, timeouts.

Parity: reference ``core/resilience/`` (SURVEY.md §2.1). One canonical
circuit-breaker implementation is shared everywhere (the reference ships two).
"""

from audio_rag_tpu.core.resilience.circuit_breaker import (
    CircuitBreaker,
    CircuitBreakerConfig,
    CircuitBreakerOpenError,
    CircuitState,
    circuit_breaker,
)
from audio_rag_tpu.core.resilience.fallback import FallbackChain, FallbackOption
from audio_rag_tpu.core.resilience.retry import RetryPolicy, retry_with_backoff
from audio_rag_tpu.core.resilience.timeout import (
    TimeoutError_,
    async_timeout,
    calculate_asr_timeout,
    with_timeout,
)

__all__ = [
    "CircuitBreaker",
    "CircuitBreakerConfig",
    "CircuitBreakerOpenError",
    "CircuitState",
    "circuit_breaker",
    "FallbackChain",
    "FallbackOption",
    "RetryPolicy",
    "retry_with_backoff",
    "TimeoutError_",
    "async_timeout",
    "with_timeout",
    "calculate_asr_timeout",
]
