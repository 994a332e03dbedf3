"""Pin Whisper output-parsing semantics against faster-whisper behavior
(reference ``asr/whisper.py:120-148``): timestamp-token pairs delimit
segments, unclosed segments run to window end, control tokens are stripped,
and the temperature-fallback quality gates (avg-logprob + gzip
compression-ratio) trip exactly when they should.
"""

import numpy as np
import pytest

from audio_rag_tpu.asr.whisper_jax import WhisperJaxASR, _compression_ratio
from audio_rag_tpu.config.schema import ASRConfig


@pytest.fixture(scope="module")
def asr():
    a = WhisperJaxASR(ASRConfig(model_size="test"))
    # parsing needs only the token layout + text decoder, not weights
    a._tokenizer = a._make_text_decoder()
    return a


class TestTimestampParsing:
    def ts(self, asr, seconds):
        return asr.tokens.timestamp_base + int(round(seconds / 0.02))

    def test_paired_timestamps_delimit_segments(self, asr):
        ids = [self.ts(asr, 0.0), 10, 11, self.ts(asr, 2.0),
               self.ts(asr, 2.0), 12, self.ts(asr, 4.5)]
        segs = asr._tokens_to_segments(ids, t0=30.0, dur=30.0, lang="en")
        assert [(s.start, s.end) for s in segs] == [(30.0, 32.0),
                                                    (32.0, 34.5)]
        assert segs[0].text and segs[1].text

    def test_unclosed_segment_runs_to_window_end(self, asr):
        ids = [self.ts(asr, 1.0), 10, 11]
        segs = asr._tokens_to_segments(ids, t0=0.0, dur=7.5, lang="en")
        assert [(s.start, s.end) for s in segs] == [(1.0, 7.5)]

    def test_no_timestamps_yields_whole_window(self, asr):
        segs = asr._tokens_to_segments([10, 11, 12], t0=5.0, dur=3.0,
                                       lang="en")
        assert [(s.start, s.end) for s in segs] == [(5.0, 8.0)]

    def test_empty_between_timestamps_dropped(self, asr):
        ids = [self.ts(asr, 0.0), self.ts(asr, 1.0),
               self.ts(asr, 1.0), 10, self.ts(asr, 2.0)]
        segs = asr._tokens_to_segments(ids, t0=0.0, dur=30.0, lang="en")
        assert len(segs) == 1 and (segs[0].start, segs[0].end) == (1.0, 2.0)

    def test_strip_special_keeps_text_and_timestamps(self, asr):
        st = asr.tokens
        # prompt(4) + text + control + timestamp + text + EOT + garbage
        ids = np.array([st.sot, st.lang_base, st.transcribe,
                        st.no_timestamps, 10, st.no_speech,
                        st.timestamp_base + 5, 11, st.eot, 12], np.int32)
        kept = asr._strip_special(ids)
        assert kept == [10, st.timestamp_base + 5, 11]


class TestFallbackGates:
    def test_compression_ratio_detects_repetition(self):
        looped = "the cat sat " * 60
        normal = ("gradient descent converges when the learning rate is "
                  "small enough to avoid divergence in practice")
        assert _compression_ratio(looped) > 2.4
        assert _compression_ratio(normal) < 2.4
        assert _compression_ratio("") == 0.0

    def test_gates(self, asr):
        st = asr.tokens
        def window(token_ids):
            row = np.full(16, st.eot, np.int32)
            row[:4] = [st.sot, st.lang_base, st.transcribe, st.no_timestamps]
            row[4:4 + len(token_ids)] = token_ids
            return row

        tokens = np.stack([
            window([10, 11, 12]),        # healthy
            window([10, 10, 10, 10, 10, 10, 10, 10, 10, 10]),  # loop
            window([10, 11, 12]),        # low logprob
        ])
        avg_lp = np.array([-0.2, -0.1, -3.0], np.float32)
        failed = asr._gates_failed(tokens, avg_lp)
        assert failed.tolist() == [False, True, True]

    def test_repetition_gate_disabled_by_config(self):
        a = WhisperJaxASR(ASRConfig(model_size="test",
                                    compression_ratio_threshold=0.0))
        a._tokenizer = a._make_text_decoder()
        st = a.tokens
        row = np.full(16, st.eot, np.int32)
        row[:4] = [st.sot, st.lang_base, st.transcribe, st.no_timestamps]
        row[4:14] = 10  # blatant loop
        failed = a._gates_failed(row[None], np.array([-0.1], np.float32))
        assert failed.tolist() == [False]
