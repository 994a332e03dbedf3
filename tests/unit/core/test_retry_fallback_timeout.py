import asyncio

import pytest

from audio_rag_tpu.core.resilience.fallback import (
    FallbackChain,
    FallbackExhaustedError,
)
from audio_rag_tpu.core.resilience.retry import (
    RetryPolicy,
    async_retry_with_backoff,
    retry_with_backoff,
)
from audio_rag_tpu.core.resilience.timeout import (
    TimeoutError_,
    async_timeout,
    calculate_asr_timeout,
    sync_timeout,
    with_timeout,
)


class TestRetry:
    def test_succeeds_after_failures(self):
        sleeps = []
        attempts = {"n": 0}

        @retry_with_backoff(
            RetryPolicy(max_attempts=3, base_delay=1.0, jitter=0.0),
            sleep=sleeps.append,
        )
        def flaky():
            attempts["n"] += 1
            if attempts["n"] < 3:
                raise ValueError("flake")
            return "done"

        assert flaky() == "done"
        assert sleeps == [1.0, 2.0]  # exponential backoff

    def test_exhausts_and_raises_last(self):
        @retry_with_backoff(
            RetryPolicy(max_attempts=2, base_delay=0.0, jitter=0.0),
            sleep=lambda _: None,
        )
        def always():
            raise ValueError("nope")

        with pytest.raises(ValueError, match="nope"):
            always()

    def test_retry_on_filter(self):
        @retry_with_backoff(
            RetryPolicy(max_attempts=3, retry_on=(KeyError,), base_delay=0.0),
            sleep=lambda _: None,
        )
        def wrong_type():
            raise ValueError("not retried")

        with pytest.raises(ValueError):
            wrong_type()

    def test_delay_capped(self):
        pol = RetryPolicy(base_delay=10.0, max_delay=15.0, jitter=0.0)
        assert pol.delay_for(5) == 15.0

    def test_async_retry(self):
        attempts = {"n": 0}

        @async_retry_with_backoff(
            RetryPolicy(max_attempts=2, base_delay=0.0, jitter=0.0)
        )
        async def flaky():
            attempts["n"] += 1
            if attempts["n"] < 2:
                raise ValueError
            return 7

        assert asyncio.run(flaky()) == 7


class TestFallback:
    def test_first_available_wins(self):
        chain = FallbackChain("t")
        chain.add("a", lambda: "A", available=lambda: False)
        chain.add("b", lambda: "B")
        name, result = chain.execute()
        assert (name, result) == ("b", "B")

    def test_factory_failure_falls_through(self):
        chain = FallbackChain("t")
        chain.add("a", lambda: 1 / 0)
        chain.add("b", lambda: "ok")
        assert chain.execute() == ("b", "ok")

    def test_exhausted(self):
        chain = FallbackChain("t")
        chain.add("a", lambda: 1 / 0)
        with pytest.raises(FallbackExhaustedError) as ei:
            chain.execute()
        assert "a" in ei.value.context["errors"]


class TestTimeout:
    def test_sync_timeout_passes(self):
        assert sync_timeout(lambda: 5, timeout=1.0) == 5

    def test_sync_timeout_fires(self):
        import time

        with pytest.raises(TimeoutError_):
            sync_timeout(time.sleep, 0.05, 0.5)

    def test_decorator_sync(self):
        @with_timeout(1.0)
        def quick():
            return "q"

        assert quick() == "q"

    def test_async_timeout(self):
        async def slow():
            await asyncio.sleep(1.0)

        async def run():
            with pytest.raises(TimeoutError_):
                await async_timeout(slow(), 0.02, "slowop")

        asyncio.run(run())

    def test_asr_timeout_scales(self):
        t1 = calculate_asr_timeout(60.0)
        t2 = calculate_asr_timeout(3600.0)
        assert t2 > t1 > 0
