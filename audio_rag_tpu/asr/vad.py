"""Energy-based voice activity detection (host-side gate).

Replaces the Silero VAD filter faster-whisper applies before transcription
(reference ``asr/whisper.py:120-126`` with ``vad_filter=True``). Frame RMS
energy with hysteresis thresholds and min-duration merging — cheap, runs on
the host during windowing; the learned conv VAD
(:func:`audio_rag_tpu.models.speaker.vad_scores`) refines frames on device
in the diarization path.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

__all__ = ["VADOptions", "energy_vad", "speech_segments"]


@dataclass
class VADOptions:
    frame_ms: int = 30
    threshold_db: float = -38.0  # speech if frame dBFS above this
    hangover_frames: int = 10  # keep speech active this many frames after
    min_speech_ms: int = 250
    min_silence_ms: int = 500


def energy_vad(
    audio: np.ndarray, sr: int = 16000, opts: VADOptions | None = None
) -> np.ndarray:
    """Raw per-frame speech flags (bool) at ``frame_ms`` granularity
    (no hangover — smoothing happens in :func:`speech_segments`)."""
    opts = opts or VADOptions()
    frame = int(sr * opts.frame_ms / 1000)
    n = len(audio) // frame
    if n == 0:
        return np.zeros(0, bool)
    x = audio[: n * frame].reshape(n, frame).astype(np.float64)
    rms = np.sqrt(np.mean(x * x, axis=1) + 1e-12)
    db = 20.0 * np.log10(rms + 1e-12)
    return db > opts.threshold_db


def speech_segments(
    audio: np.ndarray, sr: int = 16000, opts: VADOptions | None = None
) -> list[tuple[float, float]]:
    """Merged (start_s, end_s) speech spans.

    Pipeline: raw spans → drop spans shorter than ``min_speech_ms``
    (before padding, so hangover can't promote blips) → pad ends by the
    hangover → merge spans separated by < ``min_silence_ms``.
    """
    opts = opts or VADOptions()
    flags = energy_vad(audio, sr, opts)
    if flags.size == 0:
        return []
    frame_s = opts.frame_ms / 1000.0
    spans: list[tuple[float, float]] = []
    start = None
    for i, f in enumerate(flags):
        if f and start is None:
            start = i * frame_s
        elif not f and start is not None:
            spans.append((start, i * frame_s))
            start = None
    if start is not None:
        spans.append((start, len(flags) * frame_s))
    # min-speech filter on raw durations
    spans = [
        (s, e) for s, e in spans if (e - s) >= opts.min_speech_ms / 1000.0
    ]
    # hangover padding + merge
    total = len(flags) * frame_s
    pad = opts.hangover_frames * frame_s
    merged: list[tuple[float, float]] = []
    for s, e in spans:
        e = min(e + pad, total)
        if merged and s - merged[-1][1] < opts.min_silence_ms / 1000.0:
            merged[-1] = (merged[-1][0], max(merged[-1][1], e))
        else:
            merged.append((s, e))
    return merged
