"""Shared helpers for the repo-root bench drivers.

The RTF comparisons in docs/PERFORMANCE.md (ASR-only vs full ingest vs
streaming) are only meaningful if every driver measures the same input;
this is the single source of the synthetic test signal.

The signal is SPEECH-SHAPED (harmonic stack with pitch drift, formant
coloration, syllabic AM — the positive class of the learned VAD's
training curriculum, scripts/train_vad.py) arranged as alternating
multi-speaker turns with pauses. The earlier amplitude-modulated noise
signal sat in the learned VAD's trained NEGATIVE class (broadband
noise), so the diarization stage found 0 speech spans and its measured
cost was VAD-only — the window-embedding + clustering load was never
exercised. Speech-shaped turns make the diarize stage (and any
VAD-gated path) measure what a real recording pays.
"""

from __future__ import annotations

import numpy as np


def _synth_speech_turn(
    rng: np.random.Generator, n: int, sr: int, f0_base: float
) -> np.ndarray:
    """One speaker turn: harmonic stack + pitch drift + syllabic AM
    (mirrors scripts/train_vad.py::synth_speech, parameterized per
    speaker by base pitch)."""
    t = np.arange(n) / sr
    f0 = f0_base * rng.uniform(0.92, 1.08)
    drift = f0 * 0.15 * np.sin(2 * np.pi * rng.uniform(0.5, 2.0) * t)
    phase = 2 * np.pi * np.cumsum(f0 + drift) / sr
    sig = np.zeros(n)
    for h in range(1, 9):
        sig += (rng.uniform(0.3, 1.0) / h) * np.sin(h * phase)
    # formant-ish coloration: emphasize a band via a short FIR
    taps = np.sinc(np.linspace(-4, 4, 33)) * np.hanning(33)
    taps *= np.cos(2 * np.pi * rng.uniform(0.02, 0.2) * np.arange(33))
    sig = np.convolve(sig, taps, mode="same")
    # syllabic amplitude modulation (2-8 Hz)
    am = 0.5 * (1 + np.sin(2 * np.pi * rng.uniform(2, 8) * t
                           + rng.uniform(0, 6.28)))
    sig *= 0.2 + 0.8 * am ** rng.uniform(1.0, 2.0)
    return (sig / (np.abs(sig).max() + 1e-9)).astype(np.float32)


def make_bench_audio(minutes: float, sr: int = 16000,
                     seed: int = 0, num_speakers: int = 4) -> np.ndarray:
    """Deterministic multi-speaker speech-shaped signal: 3-10 s turns
    from ``num_speakers`` synthetic voices (distinct base pitches),
    separated by 0.3-1.0 s pauses."""
    rng = np.random.default_rng(seed)
    n = int(minutes * 60 * sr)
    audio = np.zeros(n, np.float32)
    f0s = rng.uniform(90, 260, num_speakers)
    pos = 0
    while pos < n:
        spk = int(rng.integers(num_speakers))
        dur = min(int(rng.uniform(3.0, 10.0) * sr), n - pos)
        audio[pos:pos + dur] = 0.3 * _synth_speech_turn(
            rng, dur, sr, f0s[spk])
        pos += dur + int(rng.uniform(0.3, 1.0) * sr)
    return audio
