import numpy as np
import pytest

from audio_rag_tpu.audio.io import (
    decode_audio,
    get_duration,
    resample,
    write_wav,
)
from audio_rag_tpu.core.exceptions import AudioProcessingError


def test_wav_roundtrip(tmp_path, sample_audio):
    audio, sr = sample_audio
    p = tmp_path / "tone.wav"
    write_wav(p, audio, sr)
    decoded, out_sr = decode_audio(p)
    assert out_sr == 16000
    assert decoded.shape == audio.shape
    np.testing.assert_allclose(decoded, audio, atol=1e-3)


def test_duration(tmp_path, sample_audio):
    audio, sr = sample_audio
    p = tmp_path / "tone.wav"
    write_wav(p, audio, sr)
    assert get_duration(p) == pytest.approx(1.0, abs=1e-3)


def test_resample_downsamples():
    sr = 48000
    t = np.arange(sr, dtype=np.float32) / sr
    x = np.sin(2 * np.pi * 440 * t).astype(np.float32)
    y = resample(x, sr, 16000)
    assert abs(len(y) - 16000) <= 1
    # tone frequency preserved: zero crossings ≈ 880/s
    crossings = np.sum(np.diff(np.signbit(y)) != 0)
    assert 850 <= crossings <= 910


def test_ndarray_input_resampled():
    x = np.zeros(32000, np.float32)
    y, sr = decode_audio(x, sample_rate=32000)
    assert sr == 16000 and len(y) == 16000


def test_ndarray_requires_sample_rate():
    with pytest.raises(AudioProcessingError):
        decode_audio(np.zeros(10, np.float32))


def test_missing_file():
    with pytest.raises(AudioProcessingError, match="not found"):
        decode_audio("/nope/missing.wav")


def test_invalid_wav(tmp_path):
    p = tmp_path / "junk.wav"
    p.write_bytes(b"ID3" + b"\x00" * 100)
    with pytest.raises(AudioProcessingError):
        decode_audio(p)


def test_stereo_downmix(tmp_path):
    import wave

    sr = 16000
    left = (np.ones(100) * 16384).astype("<i2")
    right = (np.zeros(100)).astype("<i2")
    inter = np.empty(200, "<i2")
    inter[0::2], inter[1::2] = left, right
    p = tmp_path / "st.wav"
    with wave.open(str(p), "wb") as wf:
        wf.setnchannels(2)
        wf.setsampwidth(2)
        wf.setframerate(sr)
        wf.writeframes(inter.tobytes())
    x, _ = decode_audio(p)
    assert x.shape == (100,)
    np.testing.assert_allclose(x, 0.25, atol=1e-3)
