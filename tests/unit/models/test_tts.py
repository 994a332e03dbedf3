"""TTS acoustic model + vocoder unit tests.

Covers the capability the reference outsources to piper/edge-tts
(reference ``tts/piper.py``, ``tts/edge.py``): text → mel → waveform,
here as a first-party FastSpeech-class JAX model with on-device
Griffin-Lim.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audio_rag_tpu.models.tts import (
    PAD_ID,
    TTS_PRESETS,
    apply_tts,
    griffin_lim,
    init_tts,
    length_regulate,
    mel_to_audio,
    predict_durations,
    text_to_ids,
)
from audio_rag_tpu.ops.mel import HOP_LENGTH, log_mel_spectrogram

DIMS = TTS_PRESETS["test"]


@pytest.fixture(scope="module")
def params():
    return init_tts(jax.random.PRNGKey(0), DIMS)


def test_text_to_ids_roundtrip():
    ids = text_to_ids("Ab c!", 8)
    assert ids.shape == (8,)
    assert ids[0] == text_to_ids("a", 1)[0]  # lowercased
    assert ids[5] == PAD_ID and ids[7] == PAD_ID
    # unknown characters map to space, not failure
    weird = text_to_ids("é世", 4)
    space = text_to_ids(" ", 1)[0]
    assert weird[0] == space and weird[1] == space


def test_length_regulator_expansion():
    # two symbols with durations 2 and 3 → frames [s0, s0, s1, s1, s1, 0...]
    enc = jnp.asarray(
        np.stack([np.full((4,), 1.0), np.full((4,), 2.0),
                  np.zeros(4)])[None, :, :], jnp.float32
    )  # (1, 3, 4)
    dur = jnp.asarray(np.array([[2, 3, 0]], np.int32))
    frames, valid = length_regulate(enc, dur, max_frames=8)
    got = np.asarray(frames)[0, :, 0]
    assert np.allclose(got[:5], [1, 1, 2, 2, 2])
    assert np.allclose(got[5:], 0.0)
    assert np.asarray(valid)[0].tolist() == [True] * 5 + [False] * 3


def test_apply_tts_shapes_and_masking(params):
    toks = np.stack([
        text_to_ids("hello world", DIMS.max_text),
        text_to_ids("hi", DIMS.max_text),
    ])
    mel, valid, log_dur = apply_tts(params, DIMS, jnp.asarray(toks))
    assert mel.shape == (2, DIMS.max_frames, DIMS.n_mels)
    assert log_dur.shape == (2, DIMS.max_text)
    n0, n1 = np.asarray(valid).sum(axis=1)
    assert n0 > n1 > 0  # longer text → more frames
    # masked frames are exactly zero
    m = np.asarray(mel)
    assert np.all(m[1, int(n1):] == 0.0)


def test_teacher_durations_drive_frame_count(params):
    toks = text_to_ids("abc", DIMS.max_text)[None]
    dur = np.zeros((1, DIMS.max_text), np.int32)
    dur[0, :3] = [2, 3, 4]
    _, valid, _ = apply_tts(params, DIMS, jnp.asarray(toks), jnp.asarray(dur))
    assert int(np.asarray(valid).sum()) == 9


def test_predicted_durations_clip_and_speed(params):
    toks = jnp.asarray(text_to_ids("abcd", DIMS.max_text)[None])
    log_dur = jnp.full((1, DIMS.max_text), 10.0)  # exp → huge
    dur = predict_durations(DIMS, log_dur, toks)
    d = np.asarray(dur)[0]
    assert d[:4].max() <= DIMS.max_dur and d[:4].min() >= 1
    assert np.all(d[4:] == 0)  # pads stay 0
    dur_fast = predict_durations(DIMS, jnp.zeros((1, DIMS.max_text)),
                                 toks, speed=1.0)
    dur_slow = predict_durations(DIMS, jnp.ones((1, DIMS.max_text)),
                                 toks, speed=2.0)
    # speed divides the frame count before rounding
    assert np.asarray(dur_slow)[0, 0] <= np.asarray(dur_fast)[0, 0] + 1


def test_griffin_lim_recovers_tone_frequency():
    sr = 16_000
    t = np.arange(sr // 2) / sr
    tone = (0.5 * np.sin(2 * np.pi * 440.0 * t)).astype(np.float32)
    mel = log_mel_spectrogram(jnp.asarray(tone), n_mels=80,
                              global_norm=False)
    audio = np.asarray(mel_to_audio(jnp.asarray(mel).T, n_iter=24))
    assert audio.shape[0] == mel.shape[1] * HOP_LENGTH
    spec = np.abs(np.fft.rfft(audio * np.hanning(len(audio))))
    freqs = np.fft.rfftfreq(len(audio), 1 / sr)
    peak = freqs[int(np.argmax(spec))]
    # within mel-bin resolution at 440 Hz
    assert abs(peak - 440.0) < 60.0


def test_griffin_lim_output_is_finite_and_bounded():
    mag = jnp.asarray(np.random.default_rng(0).uniform(
        0, 1, size=(32, 201)).astype(np.float32))
    audio = np.asarray(griffin_lim(mag, n_iter=4))
    assert np.all(np.isfinite(audio))
