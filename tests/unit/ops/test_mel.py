"""Golden tests: the matmul-formulated log-mel must match Whisper's
torch.stft-based reference formula (reimplemented here with torch CPU,
following openai/whisper audio.py semantics)."""

import numpy as np
import pytest

from audio_rag_tpu.ops.mel import (
    HOP_LENGTH,
    N_FFT,
    SAMPLE_RATE,
    log_mel_spectrogram,
    mel_filterbank,
    pad_or_trim,
)

torch = pytest.importorskip("torch")


def torch_log_mel(audio: np.ndarray, n_mels: int) -> np.ndarray:
    """Whisper's reference formula via torch.stft."""
    x = torch.from_numpy(audio)
    window = torch.hann_window(N_FFT)
    stft = torch.stft(
        x, N_FFT, HOP_LENGTH, window=window, center=True, return_complex=True
    )
    magnitudes = stft[..., :-1].abs() ** 2
    filters = torch.from_numpy(mel_filterbank(n_mels))
    mel_spec = filters @ magnitudes
    log_spec = torch.clamp(mel_spec, min=1e-10).log10()
    log_spec = torch.maximum(log_spec, log_spec.max() - 8.0)
    log_spec = (log_spec + 4.0) / 4.0
    return log_spec.numpy()


@pytest.mark.parametrize("n_mels", [80, 128])
def test_log_mel_matches_torch_reference(n_mels):
    rng = np.random.default_rng(42)
    audio = rng.standard_normal(SAMPLE_RATE * 2).astype(np.float32) * 0.1
    ours = np.asarray(log_mel_spectrogram(audio, n_mels=n_mels))
    ref = torch_log_mel(audio, n_mels)
    assert ours.shape == ref.shape == (n_mels, 200)
    np.testing.assert_allclose(ours, ref, atol=2e-4)


def test_log_mel_tone():
    # a 1 kHz tone must put its energy in the right mel bin neighbourhood
    t = np.arange(SAMPLE_RATE, dtype=np.float32) / SAMPLE_RATE
    audio = 0.5 * np.sin(2 * np.pi * 1000.0 * t).astype(np.float32)
    mel = np.asarray(log_mel_spectrogram(audio, n_mels=80))
    peak_bin = int(mel.mean(axis=1).argmax())
    # 1 kHz is the slaney linear/log breakpoint ≈ mel channel 29-31 of 80
    assert 25 <= peak_bin <= 35


def test_mel_filterbank_shape_and_norm():
    fb = mel_filterbank(128)
    assert fb.shape == (128, N_FFT // 2 + 1)
    assert fb.dtype == np.float32
    assert (fb >= 0).all()
    # every filter has some mass, interior ones sum to ~2/width (slaney)
    assert (fb.sum(axis=1) > 0).all()


def test_pad_or_trim():
    x = np.ones(10, np.float32)
    assert pad_or_trim(x, 16).shape == (16,)
    assert pad_or_trim(x, 4).shape == (4,)
    assert pad_or_trim(x, 10) is x
