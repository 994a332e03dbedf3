"""Synthetic speech-shaped audio (harmonic stack + syllabic AM).

Used wherever a test/prewarm needs audio the LEARNED VAD accepts as
speech — a bare sine or white noise is (correctly) rejected as non-speech,
so fixtures that must reach the decoder use this instead. Matches the
positive class of ``scripts/train_vad.py``.
"""

from __future__ import annotations

import numpy as np

__all__ = ["speech_like"]


def speech_like(
    n_samples: int,
    sample_rate: int = 16_000,
    f0: float = 160.0,
    am_hz: float = 4.0,
    level: float = 0.4,
    seed: int | None = None,
) -> np.ndarray:
    """Voiced-speech-shaped signal: harmonics of ``f0`` with 2–8 Hz
    amplitude modulation; optional noise floor when ``seed`` is given."""
    t = np.arange(n_samples) / sample_rate
    phase = 2 * np.pi * f0 * t
    sig = sum(np.sin(h * phase) / h for h in range(1, 7))
    sig *= 0.3 + 0.7 * 0.5 * (1 + np.sin(2 * np.pi * am_hz * t))
    sig = level * sig / (np.abs(sig).max() + 1e-9)
    if seed is not None:
        sig = sig + 0.02 * np.random.default_rng(seed).standard_normal(
            n_samples)
    return sig.astype(np.float32)
