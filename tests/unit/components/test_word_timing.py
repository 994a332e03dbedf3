import numpy as np
import pytest

from audio_rag_tpu.asr.word_timing import (
    attention_to_word_times,
    dtw_path,
)


class TestDTW:
    def test_diagonal_path_on_identity_cost(self):
        cost = 1.0 - np.eye(4)
        ti, fi = dtw_path(cost)
        # optimal path follows the diagonal
        on_diag = sum(1 for a, b in zip(ti, fi) if a == b)
        assert on_diag >= 4

    def test_monotonic(self):
        rng = np.random.default_rng(0)
        cost = rng.random((6, 20))
        ti, fi = dtw_path(cost)
        assert (np.diff(ti) >= 0).all()
        assert (np.diff(fi) >= 0).all()
        assert ti[0] == 0 and fi[0] == 0
        assert ti[-1] == 5 and fi[-1] == 19

    def test_shapes(self):
        ti, fi = dtw_path(np.zeros((1, 1)))
        assert len(ti) == len(fi) == 1


class TestAttentionWordTimes:
    def make_attention(self, n_tokens=4, n_frames=40, frames_per_token=10):
        """Synthetic attention: token k attends to its own frame span."""
        L, H = 4, 2
        w = np.full((L, H, n_tokens, n_frames), 0.01, np.float32)
        for k in range(n_tokens):
            w[:, :, k, k * frames_per_token:(k + 1) * frames_per_token] = 1.0
        return w

    def test_words_ordered_and_disjoint(self):
        w = self.make_attention()
        times = attention_to_word_times(w, [0, 1, 2, 3], 40)
        assert len(times) == 4
        for (s1, e1), (s2, e2) in zip(times, times[1:]):
            assert s1 < e1
            assert s2 >= e1  # monotone, non-overlapping
        # token 0 spans roughly frames 0-10 → 0.0-0.2s
        assert times[0][0] == pytest.approx(0.0, abs=0.1)
        assert times[0][1] == pytest.approx(0.2, abs=0.15)
        # last token ends near 0.8s
        assert times[3][1] == pytest.approx(0.8, abs=0.2)

    def test_time_offset(self):
        w = self.make_attention()
        times = attention_to_word_times(w, [0, 1, 2, 3], 40,
                                        time_offset=30.0)
        assert times[0][0] >= 30.0

    def test_multi_token_words(self):
        w = self.make_attention()
        # tokens 0,1 = word 0; tokens 2,3 = word 1
        times = attention_to_word_times(w, [0, 0, 1, 1], 40)
        assert len(times) == 2
        assert times[0][1] <= times[1][0] + 1e-9


class TestIntegrationWithWhisper:
    def test_asr_produces_dtw_words(self):
        """whisper-jax test preset, word_timestamps=True → per-word times
        covering the window, monotone."""
        from audio_rag_tpu.asr.whisper_jax import WhisperJaxASR
        from audio_rag_tpu.config.schema import ASRConfig

        asr = WhisperJaxASR(ASRConfig(
            backend="whisper-jax", model_size="test",
            compute_type="float32", vad_filter=False,
        ))
        asr.load()
        rng = np.random.default_rng(0)
        audio = (0.2 * rng.standard_normal(16000)).astype(np.float32)
        segs = asr.transcribe(audio, 16000, word_timestamps=True)
        assert segs, "expected at least one segment"
        words = [w for s in segs for w in s.words]
        assert words
        for a, b in zip(words, words[1:]):
            assert b.start >= a.start  # monotone timeline
        assert all(w.end > w.start for w in words)
