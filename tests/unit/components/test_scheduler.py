"""Generation scheduler: wave batching, param segregation, error paths."""

import threading
import time

import pytest

from audio_rag_tpu.engine.scheduler import (
    GenerationScheduler,
    ScheduledGenerator,
)


class RecordingGenerator:
    def __init__(self, delay_s: float = 0.0, fail: bool = False):
        self.calls: list[list[str]] = []
        self.delay_s = delay_s
        self.fail = fail
        self.is_loaded = True

    def generate_batch(self, prompts, system=None, max_tokens=None,
                       temperature=None):
        if self.fail:
            raise RuntimeError("generator exploded")
        if self.delay_s:
            time.sleep(self.delay_s)
        self.calls.append(list(prompts))
        return [f"out:{p}" for p in prompts]


class TestScheduler:
    def test_single_request(self):
        gen = RecordingGenerator()
        s = GenerationScheduler(gen, max_wait_ms=5)
        assert s.generate("hello") == "out:hello"
        s.stop()

    def test_concurrent_requests_share_a_batch(self):
        gen = RecordingGenerator(delay_s=0.05)
        s = GenerationScheduler(gen, max_batch=8, max_wait_ms=50)
        results = {}

        def client(i):
            results[i] = s.generate(f"p{i}")

        threads = [threading.Thread(target=client, args=(i,))
                   for i in range(6)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert results == {i: f"out:p{i}" for i in range(6)}
        # 6 concurrent requests must need fewer than 6 device calls
        assert len(gen.calls) < 6
        assert s.requests_served == 6
        s.stop()

    def test_different_params_split_waves(self):
        gen = RecordingGenerator()
        s = GenerationScheduler(gen, max_batch=8, max_wait_ms=30)
        f1 = s.submit("a", max_tokens=10)
        f2 = s.submit("b", max_tokens=99)
        assert f1.result() == "out:a" and f2.result() == "out:b"
        assert len(gen.calls) == 2  # incompatible params → separate batches
        s.stop()

    def test_failure_propagates_to_all_futures(self):
        gen = RecordingGenerator(fail=True)
        s = GenerationScheduler(gen, max_wait_ms=5)
        f = s.submit("x")
        with pytest.raises(RuntimeError, match="exploded"):
            f.result(timeout=5)
        s.stop()

    def test_submit_after_stop_raises(self):
        s = GenerationScheduler(RecordingGenerator(), max_wait_ms=5)
        s.stop()
        with pytest.raises(RuntimeError):
            s.submit("x")


class TestScheduledGenerator:
    def test_adapter_shape(self):
        gen = RecordingGenerator()
        sg = ScheduledGenerator(gen, max_wait_ms=5)
        assert sg.generate("q") == "out:q"
        assert sg.generate_batch(["a", "b"]) == ["out:a", "out:b"]
        parts = list(sg.generate_stream("one two three"))
        assert "".join(parts).strip() == "out:one two three"
        assert sg.check_availability()
        sg.unload()
