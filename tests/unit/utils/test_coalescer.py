"""KeyedCoalescer base: batching semantics + the stop()/submit() race.

The race regression (round-3 review): a submit that read ``_stopped ==
False`` could be preempted through ALL of stop() — flag, sentinel, join,
drain — and land its item in a queue nobody reads, hanging the client on
``future.result()`` forever. The lock makes accepted == will-resolve an
invariant; the stress test here hammers it.
"""

from __future__ import annotations

import threading
import time

import pytest

from audio_rag_tpu.utils.coalescer import KeyedCoalescer


class SquareCoalescer(KeyedCoalescer):
    worker_name = "square"

    def __init__(self, max_batch=8, linger_s=0.0, delay_s=0.0):
        self.delay_s = delay_s
        self.batch_sizes: list[int] = []
        super().__init__(max_batch=max_batch, linger_s=linger_s)

    def _run_batch(self, payloads, key):
        if self.delay_s:
            time.sleep(self.delay_s)
        self.batch_sizes.append(len(payloads))
        return [p * p for p in payloads]


class TestBatching:
    def test_items_batch_while_dispatch_in_flight(self):
        c = SquareCoalescer(max_batch=8, delay_s=0.02)
        try:
            futs = [c._submit(i, ()) for i in range(12)]
            assert [f.result(timeout=10) for f in futs] == \
                [i * i for i in range(12)]
            assert c.items_served == 12
            assert c.batches_run < 12, "nothing coalesced"
        finally:
            c.stop()

    def test_keys_never_mix(self):
        c = SquareCoalescer(max_batch=8, delay_s=0.01)
        try:
            futs = [c._submit(i, (i % 3,)) for i in range(15)]
            assert [f.result(timeout=10) for f in futs] == \
                [i * i for i in range(15)]
            # each dispatch saw one key group only (verified by override)
        finally:
            c.stop()

    def test_dispatch_error_fails_batch_not_worker(self):
        class Flaky(SquareCoalescer):
            def _run_batch(self, payloads, key):
                if key == ("bad",):
                    raise ValueError("boom")
                return super()._run_batch(payloads, key)

        c = Flaky(max_batch=4)
        try:
            bad = c._submit(1, ("bad",))
            with pytest.raises(ValueError):
                bad.result(timeout=10)
            ok = c._submit(3, ("ok",))
            assert ok.result(timeout=10) == 9, \
                "worker must survive a failed batch"
        finally:
            c.stop()

    def test_submit_after_stop_raises(self):
        c = SquareCoalescer()
        c.stop()
        with pytest.raises(RuntimeError):
            c._submit(1, ())

    def test_stop_idempotent(self):
        c = SquareCoalescer()
        c.stop()
        c.stop()


class TestStopSubmitRace:
    def test_every_accepted_submission_resolves(self):
        """Hammer submit() from 4 threads while stop() fires: every
        future whose submit did NOT raise must resolve (result or the
        stop error) — a hung future means the race leaked an item."""
        for trial in range(10):
            c = SquareCoalescer(max_batch=8, delay_s=0.001)
            futs: list = []
            done = threading.Event()

            def submitter():
                i = 0
                while not done.is_set():
                    try:
                        futs.append(c._submit(i, (i % 2,)))
                    except RuntimeError:
                        return
                    i += 1

            threads = [threading.Thread(target=submitter)
                       for _ in range(4)]
            [t.start() for t in threads]
            time.sleep(0.01)
            c.stop()
            done.set()
            [t.join(timeout=10) for t in threads]
            assert not any(t.is_alive() for t in threads)
            for f in futs:
                # resolves either way; timeout here IS the regression
                f.exception(timeout=10)
