"""Native C++ audio runtime vs the Python reference implementations."""

import numpy as np
import pytest

from audio_rag_tpu.native import (
    energy_vad as native_vad,
    native_available,
    resample as native_resample,
    wav_decode,
)

pytestmark = pytest.mark.skipif(
    not native_available(), reason="native lib not built (no toolchain)"
)


def make_wav_bytes(audio: np.ndarray, sr: int, width: int = 2,
                   channels: int = 1) -> bytes:
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(channels)
        wf.setsampwidth(width)
        wf.setframerate(sr)
        if width == 2:
            pcm = (np.clip(audio, -1, 1) * 32767).astype("<i2")
        else:
            raise NotImplementedError
        if channels == 2:
            inter = np.empty(pcm.size * 2, "<i2")
            inter[0::2] = pcm
            inter[1::2] = pcm
            pcm = inter
        wf.writeframes(pcm.tobytes())
    return buf.getvalue()


class TestNativeWavDecode:
    def test_matches_python_decoder(self):
        rng = np.random.default_rng(0)
        audio = (0.5 * rng.standard_normal(16000)).astype(np.float32)
        data = make_wav_bytes(audio, 16000)
        out, sr = wav_decode(data)
        assert sr == 16000
        np.testing.assert_allclose(out, np.clip(audio, -1, 1), atol=1e-3)

    def test_stereo_downmix(self):
        audio = np.ones(100, np.float32) * 0.5
        data = make_wav_bytes(audio, 8000, channels=2)
        out, sr = wav_decode(data)
        assert sr == 8000
        np.testing.assert_allclose(out, 0.5, atol=1e-3)

    def test_garbage_returns_none(self):
        assert wav_decode(b"not a wav at all" * 10) is None
        assert wav_decode(b"RIFF\x00\x00\x00\x00JUNK") is None


class TestNativeResample:
    def test_tone_preserved_48k_to_16k(self):
        sr = 48000
        t = np.arange(sr, dtype=np.float32) / sr
        x = np.sin(2 * np.pi * 440 * t).astype(np.float32)
        y = native_resample(x, sr, 16000)
        assert abs(len(y) - 16000) <= 1
        crossings = np.sum(np.diff(np.signbit(y[100:-100])) != 0)
        assert 850 <= crossings <= 910

    def test_fractional_ratio_44k1(self):
        """L and M both > 1 (160/441) — regression for the sinc-argument
        bug that only showed on fractional ratios."""
        sr = 44100
        t = np.arange(sr, dtype=np.float32) / sr
        x = np.sin(2 * np.pi * 440 * t).astype(np.float32)
        y = native_resample(x, sr, 16000)
        assert abs(len(y) - 16000) <= 1
        crossings = np.sum(np.diff(np.signbit(y[200:-200])) != 0)
        assert 850 <= crossings <= 910
        # amplitude preserved (interpolation gain correct)
        assert 0.9 < np.abs(y[200:-200]).max() < 1.1

    def test_upsample(self):
        x = np.sin(2 * np.pi * 100 * np.arange(8000) / 8000).astype(np.float32)
        y = native_resample(x, 8000, 16000)
        assert abs(len(y) - 16000) <= 1

    def test_close_to_scipy(self):
        from scipy.signal import resample_poly

        rng = np.random.default_rng(1)
        # band-limited input so both filters see in-band content
        x = rng.standard_normal(4800).astype(np.float32)
        from scipy.signal import sosfiltfilt, butter

        sos = butter(6, 0.2, output="sos")
        x = sosfiltfilt(sos, x).astype(np.float32)
        y_native = native_resample(x, 48000, 16000)
        y_scipy = resample_poly(x, 1, 3).astype(np.float32)
        n = min(len(y_native), len(y_scipy)) - 32
        err = np.abs(y_native[16:n] - y_scipy[16:n]).max()
        assert err < 0.05  # different windows, same passband behaviour


class TestNativeVAD:
    def test_matches_python_flags(self):
        from audio_rag_tpu.asr.vad import VADOptions, energy_vad

        rng = np.random.default_rng(0)
        audio = np.concatenate([
            np.zeros(16000, np.float32),
            (0.3 * rng.standard_normal(16000)).astype(np.float32),
        ])
        opts = VADOptions()
        frame = int(16000 * opts.frame_ms / 1000)
        py = energy_vad(audio, 16000, opts)
        nat = native_vad(audio, frame, opts.threshold_db)
        np.testing.assert_array_equal(py, nat)
