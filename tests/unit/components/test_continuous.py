"""Continuous-batching LLM scheduler: correctness vs the one-shot decode,
no head-of-line blocking under mixed load, and slot reuse under
oversubscription."""

import time

import numpy as np
import pytest

from audio_rag_tpu.config.schema import GenerationConfig
from audio_rag_tpu.engine.continuous import ContinuousBatcher
from audio_rag_tpu.generation.llm_jax import LLMGenerator

PROMPTS = [
    "alpha bravo charlie delta",
    "echo foxtrot golf",
    "hotel india juliet kilo lima",
]


@pytest.fixture(scope="module")
def generator():
    gen = LLMGenerator(GenerationConfig(
        model="test", temperature=0.0, use_scheduler=False, max_tokens=24,
    ))
    gen.load()
    yield gen
    gen.unload()


@pytest.fixture()
def batcher(generator):
    b = ContinuousBatcher(generator, n_slots=4, segment_tokens=8)
    yield b
    b.stop()


def _next_token_logits(generator, prompt: str, prefix_ids: list[int]):
    """Teacher-forced next-token logits after prompt+prefix (no KV cache) —
    the ground-truth arbiter when the two decode paths disagree."""
    import jax.numpy as jnp

    from audio_rag_tpu.models.llm import llm_forward

    ids = generator._tok.encode(prompt) + list(prefix_ids)
    logits, _ = llm_forward(
        generator._params, generator.dims,
        jnp.asarray(np.asarray(ids, np.int32)[None]), 0, None,
    )
    return np.asarray(logits[0, -1])


def _wave_ids(generator, prompt: str, max_tokens: int) -> list[int]:
    """Raw generated token ids from the one-shot (wave) decode path
    (the generator records them — the wave loop is a jitted program, so
    a spy on llm_generate would only see tracers)."""
    generator.generate_batch([prompt], max_tokens=max_tokens)
    return list(generator.last_token_ids[0])


class TestCorrectness:
    def test_matches_wave_decode_greedy(self, generator, batcher):
        """Greedy continuous decode reproduces the one-shot decode at the
        TOKEN level: per-slot positions + right-padded prefill are
        math-identical to the left-padded batch program. XLA does NOT
        guarantee bit-identical fusion across the two compiled programs
        (nor across cached vs fresh compiles), so when the model puts two
        logits within rounding of each other the greedy argmax may
        legitimately differ — the paths must agree up to the first step
        where teacher-forced logits confirm such a near-tie."""
        from audio_rag_tpu.engine.continuous import ContinuousBatcher

        recorded: dict[str, list[int]] = {}
        orig_finish = ContinuousBatcher._finish

        def record(self, slot):
            recorded[slot.request.prompt] = list(slot.tokens)
            orig_finish(self, slot)

        ContinuousBatcher._finish = record
        try:
            expected = {p: _wave_ids(generator, p, 24) for p in PROMPTS}
            futures = [batcher.submit(p, max_tokens=24) for p in PROMPTS]
            for f in futures:
                f.result(timeout=120)
        finally:
            ContinuousBatcher._finish = orig_finish

        eos = generator._tok.eos_id
        for prompt in PROMPTS:
            got = recorded[prompt]
            if eos in got:
                got = got[: got.index(eos)]
            got = got[:24]
            exp = expected[prompt]
            if got == exp:
                continue
            n = min(len(got), len(exp))
            first = next(
                (i for i in range(n) if got[i] != exp[i]), n)
            logits = _next_token_logits(generator, prompt, exp[:first])
            top2 = np.partition(logits, -2)[-2:]
            near = logits.max() - 0.05
            assert float(top2[1] - top2[0]) < 0.05, (
                f"real divergence on {prompt!r} at token {first}: "
                f"top-2 gap {float(top2[1] - top2[0]):.4f}")
            if first < n:
                assert logits[got[first]] >= near, (
                    f"continuous path picked a non-near-max token on "
                    f"{prompt!r} at {first}")
                assert logits[exp[first]] >= near, (
                    f"wave path picked a non-near-max token on "
                    f"{prompt!r} at {first}")

    def test_temperature_zero_deterministic(self, batcher):
        a = batcher.generate("november oscar papa", max_tokens=12)
        b = batcher.generate("november oscar papa", max_tokens=12)
        assert a == b

    def test_max_tokens_respected(self, generator, batcher):
        out = batcher.generate("quebec romeo sierra", max_tokens=5)
        n = len(generator._tok.encode(out, add_special=False))
        assert n <= 5

    def test_tokens_generated_counter(self, batcher):
        """tokens_generated counts actual delivered ids (the honest
        tokens/s numerator — re-encoding decoded text is lossy)."""
        before = batcher.tokens_generated
        batcher.generate("tango uniform victor", max_tokens=7)
        delta = batcher.tokens_generated - before
        assert 1 <= delta <= 7


class TestNoHeadOfLineBlocking:
    def test_short_requests_overtake_long_one(self, batcher):
        """A long generation must not block short ones: shorts join at the
        next segment boundary and finish while the long one still runs."""
        done_at: dict[str, float] = {}

        def record(name):
            def cb(_):
                done_at[name] = time.perf_counter()
            return cb

        long_f = batcher.submit("tango uniform", max_tokens=96)
        long_f.add_done_callback(record("long"))
        time.sleep(0.05)  # let the long request start decoding
        short_fs = []
        for i in range(3):
            f = batcher.submit(f"victor whiskey {i}", max_tokens=4)
            f.add_done_callback(record(f"short{i}"))
            short_fs.append(f)
        for f in short_fs:
            f.result(timeout=120)
        assert not long_f.done() or all(
            done_at[f"short{i}"] <= done_at["long"] for i in range(3)
        ), "short requests must not wait for the long generation"
        long_f.result(timeout=120)

    def test_oversubscription_all_served(self, batcher):
        futures = [batcher.submit(f"xray yankee {i}", max_tokens=6)
                   for i in range(12)]  # 12 requests, 4 slots
        results = [f.result(timeout=180) for f in futures]
        assert len(results) == 12
        assert batcher.requests_served >= 12


class TestAdaptiveSegments:
    def test_segment_selection_policy(self, generator):
        """Long segments only when idle AND every live slot has quota."""
        from audio_rag_tpu.engine.continuous import _Slot, _Request

        b = ContinuousBatcher(generator, n_slots=2, segment_tokens=4,
                              idle_segment_tokens=16)
        try:
            req = _Request("p", None, None, None)
            # no live slots: stays short (nothing to speed up)
            assert b._segment_for_dispatch() == 4
            slot = _Slot(request=req, tokens=[1], pos=8, max_new=64,
                         last_token=1)
            b._slots[0] = slot
            assert b._segment_for_dispatch() == 16
            # a waiting request forces short segments (join latency)
            b._queue.put(_Request("q", None, None, None))
            assert b._segment_for_dispatch() == 4
            b._queue.get_nowait()
            # a slot near its cap forces short segments (no overshoot)
            slot.max_new = len(slot.tokens) + 8
            assert b._segment_for_dispatch() == 4
        finally:
            b._slots[0] = None
            b.stop()

    def test_adaptive_matches_fixed_output(self, generator):
        """Adaptive segments change dispatch granularity, not tokens."""
        fixed = ContinuousBatcher(generator, n_slots=2, segment_tokens=4)
        try:
            want = [fixed.submit(p, max_tokens=20) for p in PROMPTS[:2]]
            want = [f.result(timeout=120) for f in want]
            fixed_segments = fixed.segments_run
        finally:
            fixed.stop()
        adaptive = ContinuousBatcher(generator, n_slots=2, segment_tokens=4,
                                     idle_segment_tokens=16)
        try:
            got = [adaptive.submit(p, max_tokens=20) for p in PROMPTS[:2]]
            got = [f.result(timeout=120) for f in got]
            assert got == want
            # fewer dispatches for the same tokens is the entire point
            assert adaptive.segments_run < fixed_segments
        finally:
            adaptive.stop()


class TestTokenStreaming:
    def test_stream_deltas_accumulate_to_full_text(self, generator):
        from audio_rag_tpu.engine.scheduler import ScheduledGenerator

        sg = ScheduledGenerator(generator, mode="continuous", n_slots=2,
                                segment_tokens=4)
        try:
            full = sg.generate("streaming check one two", max_tokens=16)
            deltas = list(sg.generate_stream("streaming check one two",
                                             max_tokens=16))
            assert len(deltas) >= 2, "expected multiple streamed segments"
            assert "".join(deltas).strip() == full
        finally:
            sg.scheduler.stop()


class TestFactoryWiring:
    def test_scheduled_generator_continuous_mode(self, generator):
        from audio_rag_tpu.engine.scheduler import ScheduledGenerator

        sg = ScheduledGenerator(generator, mode="continuous", n_slots=2,
                                segment_tokens=8)
        try:
            out = sg.generate_batch(["zulu one", "zulu two"], max_tokens=6)
            assert len(out) == 2
        finally:
            sg.scheduler.stop()


class TestSpeculativeSlots:
    """llm_decode_slots_spec: greedy parity with the plain slot path,
    mixed-temperature safety, and the history plumbing."""

    def _record_tokens(self, generator, spec_k, prompts, max_tokens=24):
        from audio_rag_tpu.engine.continuous import ContinuousBatcher

        recorded: dict[str, list[int]] = {}
        orig_finish = ContinuousBatcher._finish

        def record(self, slot):
            recorded[slot.request.prompt] = list(slot.tokens)
            orig_finish(self, slot)

        ContinuousBatcher._finish = record
        b = ContinuousBatcher(generator, n_slots=4, segment_tokens=8,
                              spec_k=spec_k)
        try:
            futures = [b.submit(p, max_tokens=max_tokens) for p in prompts]
            for f in futures:
                f.result(timeout=120)
        finally:
            ContinuousBatcher._finish = orig_finish
            b.stop()
        return recorded

    def test_spec_matches_plain_greedy(self, generator):
        """Speculative segments must reproduce the plain slot decode at
        the token level (same near-tie arbitration as the wave-parity
        test: block-verify and step decode are different XLA programs,
        so rounding may legitimately flip a within-noise argmax)."""
        plain = self._record_tokens(generator, 0, PROMPTS)
        spec = self._record_tokens(generator, 4, PROMPTS)
        eos = generator._tok.eos_id
        for prompt in PROMPTS:
            a, b = list(plain[prompt]), list(spec[prompt])
            for seq in (a, b):
                if eos in seq:
                    del seq[seq.index(eos):]
            if a[:24] == b[:24]:
                continue
            n = min(len(a), len(b), 24)
            first = next((i for i in range(n) if a[i] != b[i]), n)
            logits = _next_token_logits(generator, prompt, a[:first])
            top2 = np.partition(logits, -2)[-2:]
            assert float(top2[1] - top2[0]) < 0.05, (
                f"real spec-vs-plain divergence on {prompt!r} at "
                f"token {first}: top-2 gap {float(top2[1]-top2[0]):.4f}")

    def test_mixed_temperatures(self, generator):
        """Sampling rows ride the same speculative program (one token per
        iteration, sampled from the block head) alongside greedy rows."""
        from audio_rag_tpu.engine.continuous import ContinuousBatcher

        b = ContinuousBatcher(generator, n_slots=4, segment_tokens=8,
                              spec_k=4)
        try:
            f1 = b.submit("tango uniform victor", max_tokens=12,
                          temperature=0.0)
            f2 = b.submit("whiskey xray yankee", max_tokens=12,
                          temperature=0.8)
            out1 = f1.result(timeout=120)
            out2 = f2.result(timeout=120)
            assert isinstance(out1, str) and isinstance(out2, str)
        finally:
            b.stop()

    def test_spec_counts_real_tokens(self, generator):
        """tokens_generated must count delivered ids, not segment quota
        (a row that EOSes mid-block stops there)."""
        from audio_rag_tpu.engine.continuous import ContinuousBatcher

        b = ContinuousBatcher(generator, n_slots=2, segment_tokens=8,
                              spec_k=4)
        try:
            out = b.generate("zulu alpha", max_tokens=6)
            n = len(generator._tok.encode(out, add_special=False))
            assert n <= 6
            assert b.tokens_generated >= 1
        finally:
            b.stop()


class TestPipelinedSegments:
    """pipeline_segments=True chains segment k+1 off k's device outputs;
    delivered text must be identical to the unpipelined batcher (the
    chained program slices last/pos on device from the same packed
    output the host reads)."""

    def test_pipelined_matches_plain(self, generator):
        outs = {}
        for pipelined in (False, True):
            b = ContinuousBatcher(generator, n_slots=4, segment_tokens=8,
                                  pipeline_segments=pipelined)
            try:
                futures = [b.submit(p, max_tokens=32) for p in PROMPTS]
                outs[pipelined] = [f.result(timeout=120) for f in futures]
            finally:
                b.stop()
        assert outs[True] == outs[False]

    def test_pipelined_mid_eos_slot_not_corrupted(self, generator):
        """A slot that finishes while a chained segment is in flight must
        deliver exactly its capped output, and later requests reusing the
        slot must still work."""
        b = ContinuousBatcher(generator, n_slots=2, segment_tokens=8,
                              pipeline_segments=True)
        try:
            # mismatched max_tokens: the short one finishes while the
            # long one keeps chaining
            f_long = b.submit(PROMPTS[0], max_tokens=40)
            f_short = b.submit(PROMPTS[1], max_tokens=24)
            short = f_short.result(timeout=120)
            long_ = f_long.result(timeout=120)
            n = len(generator._tok.encode(short, add_special=False))
            assert n <= 24
            # slot reuse after the pipelined finish
            again = b.generate(PROMPTS[2], max_tokens=12)
            assert isinstance(long_, str) and isinstance(again, str)
        finally:
            b.stop()
