"""``condition_on_previous_text`` semantics (faster-whisper's default
decode conditioning, reference ``asr/whisper.py:120-126``).

Pins the openai/whisper ``transcribe()`` rules the reference inherits:
each window's prompt = ``<|startofprev|>`` + accumulated history
(capped at n_text_ctx/2−1, bucketed down — the documented TPU
static-shape deviation) + SOT sequence; history accumulates across
windows; a window whose final decode temperature exceeds
``prompt_reset_on_temperature`` resets the history for the NEXT window.
The conditioning driver is tested against a scripted transcribe stub
(exact history/reset behavior) plus a real end-to-end run on the tiny
preset (prompt plumbing through the compiled program).
"""

import numpy as np
import pytest

from audio_rag_tpu.asr.whisper_jax import WhisperJaxASR
from audio_rag_tpu.audio.synth import speech_like
from audio_rag_tpu.config.schema import ASRConfig


def make_asr(**kw) -> WhisperJaxASR:
    cfg = ASRConfig(
        backend="whisper-jax", model_size="test", vad_filter=False,
        condition_on_previous_text=True, temperature_fallback=False,
        compute_type="float32", **kw,
    )
    return WhisperJaxASR(cfg)


class TestConditioningDriver:
    """Scripted-stub tests of the sequential conditioning logic."""

    def _drive(self, asr, scripted, n_windows):
        """Run _transcribe_conditioned against a stub returning scripted
        (clean_ids, final_temp) per window; returns recorded prev_ids."""
        calls = []

        def fake_batch(windows, lang, want_words=False, lang_offset=0,
                       prev_ids=None, return_meta=False, **kw):
            assert return_meta
            ids, temp = scripted[len(calls)]
            calls.append(prev_ids)
            return [[]], {"clean_ids": [ids],
                          "final_temp": np.array([temp], np.float32)}

        asr._transcribe_batch = fake_batch
        windows = [(float(i), np.zeros(100, np.float32))
                   for i in range(n_windows)]
        asr._transcribe_conditioned(windows, "en", 0, want_words=False)
        return calls

    def test_history_accumulates_and_buckets(self):
        asr = make_asr()
        # test dims: n_text_ctx=32 → cap 15, buckets {4, 8, 15}
        assert asr._prompt_buckets() == [4, 8, 15]
        calls = self._drive(asr, [
            (list(range(100, 110)), 0.0),   # 10 ids
            (list(range(200, 203)), 0.0),   # 3 ids → history 13
            ([], 0.0),
        ], 3)
        assert calls[0] is None                      # first window: no prev
        assert calls[1] == list(range(102, 110))     # 10 → bucket 8, last 8
        # history 13 → bucket 8 again, last 8 of the 13
        assert calls[2] == [105, 106, 107, 108, 109, 200, 201, 202]

    def test_cap_is_text_ctx_half_minus_one(self):
        asr = make_asr()
        calls = self._drive(asr, [
            (list(range(100)), 0.0),  # 100 ids >> cap 15
            ([], 0.0),
        ], 2)
        assert calls[1] == list(range(85, 100))  # last cap=15

    def test_reset_on_high_temperature(self):
        asr = make_asr()
        calls = self._drive(asr, [
            ([1, 2, 3, 4], 0.0),
            ([5, 6, 7, 8], 0.8),   # > 0.5 → reset for the NEXT window
            ([9, 10, 11, 12], 0.0),
            ([], 0.0),
        ], 4)
        assert calls[1] == [1, 2, 3, 4]
        assert calls[2] is None                 # history reset
        assert calls[3] == [9, 10, 11, 12]      # accumulates again

    def test_low_fallback_temperature_keeps_history(self):
        asr = make_asr()
        calls = self._drive(asr, [
            ([1, 2, 3, 4], 0.4),   # ≤ 0.5: keep conditioning
            ([5, 6, 7, 8], 0.0),
            ([], 0.0),
        ], 3)
        assert calls[1] == [1, 2, 3, 4]
        assert calls[2] == [1, 2, 3, 4, 5, 6, 7, 8]

    def test_short_history_below_smallest_bucket_unconditioned(self):
        asr = make_asr()
        calls = self._drive(asr, [([1, 2], 0.0), ([], 0.0)], 2)
        assert calls[1] is None  # 2 < smallest bucket 4 → skip


class TestConditionedPromptPlumbing:
    """Real backend: the conditioned prompt reaches the device program."""

    @pytest.fixture(scope="class")
    def asr(self):
        a = make_asr()
        a.load()
        yield a
        a.unload()

    def test_prompt_layout(self, asr):
        captured = {}
        orig = asr._place_batch

        def spy(mel, prompt):
            captured["prompt"] = prompt.copy()
            return orig(mel, prompt)

        asr._place_batch = spy
        try:
            window = speech_like(int(1.2 * 16000), 16000, seed=0)
            per, meta = asr._transcribe_batch(
                [(0.0, window)], "en", prev_ids=[100, 101, 102, 103],
                return_meta=True)
        finally:
            asr._place_batch = orig
        st = asr.tokens
        row = captured["prompt"][0].tolist()
        assert row == [st.sot_prev, 100, 101, 102, 103,
                       st.sot, st.lang_base, st.transcribe,
                       st.no_timestamps]
        assert len(meta["clean_ids"]) == 1
        # decoded ids exclude the 9-token prompt and all control tokens
        assert all(i < st.eot or i >= st.timestamp_base
                   for i in meta["clean_ids"][0])

    def test_end_to_end_multi_window(self, asr):
        """Flag-on transcribe over several windows runs the sequential
        path and produces offset-correct segments."""
        sr = 16000
        audio = speech_like(int(4 * 1.2 * sr), sr, seed=1)  # 4 windows
        segs = asr.transcribe(audio, sr)
        assert isinstance(segs, list)
        for s in segs:
            assert 0.0 <= s.start <= s.end <= 4 * 1.2 + 0.1

    def test_decode_budget_shrinks_with_prompt(self, asr):
        """prompt + new tokens must fit n_text_ctx (whisper's own cap)."""
        window = speech_like(int(1.2 * 16000), 16000, seed=2)
        prev = list(range(100, 115))  # full 15-token cap
        per, meta = asr._transcribe_batch(
            [(0.0, window)], "en", prev_ids=prev, return_meta=True)
        # P = 1 + 15 + 4 = 20; decode ≤ 32 − 20 = 12 new tokens
        assert len(meta["clean_ids"][0]) <= asr.dims.n_text_ctx - 20
