"""Production wiring of the time-axis-sharded mel (SURVEY §2.4 long audio).

``WhisperJaxASR._mel_for_batch`` must route time-contiguous window batches
through ``ops/mel.log_mel_sharded`` whenever the mesh has >1 data device,
and the sharded result must equal the full-span single-device mel sliced
into windows (the openai/whisper full-file-mel semantics the reference
inherits via faster-whisper).
"""

import jax
import numpy as np
import pytest

import audio_rag_tpu.ops.mel as mel_mod
from audio_rag_tpu.asr.whisper_jax import WhisperJaxASR
from audio_rag_tpu.config.schema import ASRConfig
from audio_rag_tpu.ops.mel import HOP_LENGTH, log_mel_spectrogram


@pytest.fixture(scope="module")
def asr():
    assert len(jax.devices()) == 8
    a = WhisperJaxASR(ASRConfig(
        model_size="test", compute_type="float32", vad_filter=False,
        window_batch_size=8, temperature_fallback=False,
    ))
    a.load()
    return a


def _contiguous_windows(asr, b, seed=0):
    n = 2 * asr.dims.n_audio_ctx * HOP_LENGTH
    rng = np.random.default_rng(seed)
    return (0.2 * rng.standard_normal((b, n))).astype(np.float32)


def test_sharded_batch_mel_matches_fullspan_slices(asr):
    win = _contiguous_windows(asr, 8)
    out = np.asarray(asr._mel_for_batch(win, contiguous=True))
    B, n = win.shape
    T = n // HOP_LENGTH
    # reference: ONE unsharded mel over the concatenated span, sliced
    full = np.asarray(log_mel_spectrogram(
        jax.numpy.asarray(win.reshape(-1)), n_mels=asr.dims.n_mels))
    ref = full.reshape(asr.dims.n_mels, B, T).transpose(1, 0, 2)
    assert out.shape == (B, asr.dims.n_mels, T)
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-5)


def test_transcribe_routes_contiguous_batches_through_sharded_mel(
        asr, monkeypatch):
    calls = {"n": 0}
    real = mel_mod.log_mel_sharded

    def spy(*a, **kw):
        calls["n"] += 1
        return real(*a, **kw)

    monkeypatch.setattr(mel_mod, "log_mel_sharded", spy)
    window_s = 2 * asr.dims.n_audio_ctx * HOP_LENGTH / 16000
    audio = _contiguous_windows(asr, 8, seed=1).reshape(-1)
    segs = asr.transcribe(audio, 16000)
    assert calls["n"] >= 1, "contiguous batch must take the sharded mel path"
    assert segs
    starts = [s.start for s in segs]
    assert starts == sorted(starts)
    assert max(s.end for s in segs) > 7 * window_s


def test_flag_off_and_noncontiguous_fall_back(asr, monkeypatch):
    def boom(*a, **kw):  # pragma: no cover - must not run
        raise AssertionError("sharded mel must not be called")

    monkeypatch.setattr(mel_mod, "log_mel_sharded", boom)
    win = _contiguous_windows(asr, 8, seed=2)
    # non-contiguous (VAD-gapped) batches use the per-window program
    out = np.asarray(asr._mel_for_batch(win, contiguous=False))
    assert out.shape[0] == 8
    # and the config flag disables the sharded path outright
    monkeypatch.setattr(asr.config, "mel_sharded", False)
    out2 = np.asarray(asr._mel_for_batch(win, contiguous=True))
    np.testing.assert_allclose(out, out2, atol=1e-6)
