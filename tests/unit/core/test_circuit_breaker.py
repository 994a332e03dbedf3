import pytest

from audio_rag_tpu.core.resilience.circuit_breaker import (
    CircuitBreaker,
    CircuitBreakerConfig,
    CircuitBreakerOpenError,
    CircuitState,
)


class FakeClock:
    def __init__(self):
        self.t = 0.0

    def __call__(self):
        return self.t

    def advance(self, dt):
        self.t += dt


def make(threshold=3, recovery=10.0, success=2):
    clock = FakeClock()
    cb = CircuitBreaker(
        "t",
        CircuitBreakerConfig(
            failure_threshold=threshold,
            recovery_timeout=recovery,
            success_threshold=success,
        ),
        clock=clock,
    )
    return cb, clock


def boom():
    raise RuntimeError("boom")


def test_opens_after_threshold_failures():
    cb, _ = make(threshold=3)
    for _ in range(3):
        with pytest.raises(RuntimeError):
            cb.call(boom)
    assert cb.state is CircuitState.OPEN
    with pytest.raises(CircuitBreakerOpenError):
        cb.call(lambda: 1)
    assert cb.stats.total_rejected == 1


def test_success_resets_consecutive_failures():
    cb, _ = make(threshold=3)
    for _ in range(2):
        with pytest.raises(RuntimeError):
            cb.call(boom)
    assert cb.call(lambda: 42) == 42
    assert cb.stats.consecutive_failures == 0
    assert cb.state is CircuitState.CLOSED


def test_half_open_after_recovery_then_close():
    cb, clock = make(threshold=1, recovery=5.0, success=2)
    with pytest.raises(RuntimeError):
        cb.call(boom)
    assert cb.state is CircuitState.OPEN
    clock.advance(5.1)
    assert cb.state is CircuitState.HALF_OPEN
    cb.call(lambda: 1)
    assert cb.state is CircuitState.HALF_OPEN  # needs 2 successes
    cb.call(lambda: 1)
    assert cb.state is CircuitState.CLOSED


def test_half_open_failure_reopens():
    cb, clock = make(threshold=1, recovery=5.0)
    with pytest.raises(RuntimeError):
        cb.call(boom)
    clock.advance(6.0)
    assert cb.state is CircuitState.HALF_OPEN
    with pytest.raises(RuntimeError):
        cb.call(boom)
    assert cb.state is CircuitState.OPEN


def test_async_call():
    import asyncio

    cb, _ = make()

    async def ok():
        return "ok"

    assert asyncio.run(cb.call_async(ok)) == "ok"


def test_decorator_form():
    from audio_rag_tpu.core.resilience.circuit_breaker import circuit_breaker

    calls = []

    @circuit_breaker("deco", failure_threshold=2)
    def f(x):
        calls.append(x)
        return x * 2

    assert f(3) == 6
    assert f.breaker.stats.total_successes == 1
