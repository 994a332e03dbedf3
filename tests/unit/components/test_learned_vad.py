"""Learned conv VAD (committed weights from scripts/train_vad.py): span
accuracy on synthetic speech+noise, rejection of the energy gate's failure
modes, and the backend dispatch / graceful degradation rules."""

import numpy as np
import pytest

from audio_rag_tpu.asr.vad import (
    VADOptions,
    energy_vad,
    learned_vad,
    speech_segments,
)

SR = 16000


def speech_like(n, rng, f0=160.0):
    """Harmonic stack + syllabic AM (the class the VAD was trained on)."""
    t = np.arange(n) / SR
    phase = 2 * np.pi * f0 * t
    sig = sum(np.sin(h * phase) / h for h in range(1, 7))
    sig *= 0.3 + 0.7 * 0.5 * (1 + np.sin(2 * np.pi * 4.0 * t))
    return (0.4 * sig / np.abs(sig).max()).astype(np.float32)


@pytest.fixture(scope="module", autouse=True)
def require_weights():
    flags = learned_vad(np.zeros(SR, np.float32), SR)
    if flags is None:
        pytest.skip("vad_small.npz asset missing")


class TestLearnedSpans:
    def test_speech_span_located(self):
        rng = np.random.default_rng(0)
        audio = np.zeros(SR * 5, np.float32)
        audio[SR: SR * 3] = speech_like(SR * 2, rng)
        audio += 0.01 * rng.standard_normal(audio.size).astype(np.float32)
        spans = speech_segments(audio, SR, VADOptions(backend="learned"))
        assert len(spans) == 1
        s, e = spans[0]
        assert abs(s - 1.0) < 0.3 and abs(e - 3.0) < 0.4

    def test_rejects_steady_tone_that_fools_energy(self):
        t = np.arange(SR * 3) / SR
        tone = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
        opts_e = VADOptions(backend="energy")
        opts_l = VADOptions(backend="learned")
        assert speech_segments(tone, SR, opts_e)  # energy is fooled
        assert speech_segments(tone, SR, opts_l) == []

    def test_rejects_white_noise_burst(self):
        rng = np.random.default_rng(1)
        noise = (0.5 * rng.standard_normal(SR * 3)).astype(np.float32)
        assert speech_segments(noise, SR,
                               VADOptions(backend="learned")) == []

    def test_silence(self):
        assert speech_segments(np.zeros(SR * 2, np.float32), SR,
                               VADOptions(backend="learned")) == []

    def test_two_utterances_merge_rules(self):
        rng = np.random.default_rng(2)
        audio = np.zeros(SR * 6, np.float32)
        audio[int(0.5 * SR): int(1.5 * SR)] = speech_like(SR, rng)
        audio[int(4.0 * SR): int(5.2 * SR)] = speech_like(
            int(1.2 * SR), rng, f0=220.0)
        spans = speech_segments(audio, SR, VADOptions(backend="learned"))
        assert len(spans) == 2  # 2.5 s gap > min_silence_ms


class TestDispatch:
    def test_auto_prefers_learned(self):
        t = np.arange(SR * 3) / SR
        tone = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
        # auto must agree with learned (tone rejected), not energy
        assert speech_segments(tone, SR, VADOptions(backend="auto")) == []

    def test_non_16k_degrades_to_energy(self):
        rng = np.random.default_rng(3)
        audio = (0.4 * rng.standard_normal(8000 * 2)).astype(np.float32)
        assert learned_vad(audio, 8000) is None
        spans = speech_segments(audio, 8000, VADOptions(backend="auto"))
        flags = energy_vad(audio, 8000)
        assert (len(spans) > 0) == bool(flags.any())

    def test_flag_length_matches_10ms_frames(self):
        audio = np.zeros(SR * 2 + 1234, np.float32)
        flags = learned_vad(audio, SR)
        assert flags.size == audio.size // (SR // 100)


class TestASRWiring:
    def test_whisper_vad_gate_uses_learned_backend(self):
        from audio_rag_tpu.asr.whisper_jax import WhisperJaxASR
        from audio_rag_tpu.config.schema import ASRConfig

        asr = WhisperJaxASR(ASRConfig(
            model_size="test", compute_type="float32",
            vad_filter=True, vad_backend="learned",
        ))
        asr.load()
        try:
            t = np.arange(SR * 3) / SR
            tone = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
            assert asr.transcribe(tone, SR) == []  # gated before decode
        finally:
            asr.unload()


class TestBatchedSpeechSegments:
    """speech_segments_batch stacks many audios' windows into one
    dispatch set (the streaming-mux gate); spans must equal per-audio
    speech_segments exactly — windows are independent to the model."""

    def test_batch_equals_per_audio_learned(self):
        from audio_rag_tpu.asr.vad import speech_segments_batch
        from audio_rag_tpu.audio.synth import speech_like

        opts = VADOptions(backend="learned")
        rng = np.random.default_rng(0)
        audios = [
            speech_like(SR * 5, SR, seed=1),
            np.zeros(SR * 4, np.float32),  # silence → no spans
            (0.3 * rng.standard_normal(SR * 2 + 777)).astype(np.float32),
            np.zeros(0, np.float32),  # empty → no spans, no windows
            speech_like(SR * 3 + 123, SR, seed=2),
        ]
        got = speech_segments_batch(audios, SR, opts)
        want = [speech_segments(a, SR, opts) for a in audios]
        assert got == want
        assert got[3] == []

    def test_batch_energy_fallback(self):
        from audio_rag_tpu.asr.vad import speech_segments_batch

        opts = VADOptions(backend="energy")
        rng = np.random.default_rng(5)
        audios = [(0.4 * rng.standard_normal(SR)).astype(np.float32),
                  np.zeros(SR, np.float32)]
        got = speech_segments_batch(audios, SR, opts)
        want = [speech_segments(a, SR, opts) for a in audios]
        assert got == want
