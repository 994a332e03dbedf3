"""Shared helpers for the repo-root bench drivers.

The RTF comparisons in docs/PERFORMANCE.md (ASR-only vs full ingest vs
streaming) are only meaningful if every driver measures the same input;
this is the single source of the synthetic test signal.
"""

from __future__ import annotations

import numpy as np


def make_bench_audio(minutes: float, sr: int = 16000,
                     seed: int = 0) -> np.ndarray:
    """Speech-band noise with 3 Hz amplitude modulation (VAD-friendly,
    nonzero mel energy), deterministic per seed."""
    rng = np.random.default_rng(seed)
    n = int(minutes * 60 * sr)
    audio = (0.1 * rng.standard_normal(n)).astype(np.float32)
    audio *= 0.5 * (1 + np.sin(
        2 * np.pi * 3.0 * np.arange(n) / sr)).astype(np.float32)
    return audio
