"""Deterministic fake diarizer: round-robin speakers on a fixed period."""

from __future__ import annotations

from typing import Any

import numpy as np

from audio_rag_tpu.audio.io import decode_audio
from audio_rag_tpu.config.schema import DiarizationConfig
from audio_rag_tpu.core.base import BaseDiarizer
from audio_rag_tpu.core.types import TranscriptSegment
from audio_rag_tpu.diarization.base import DiarizationRegistry

__all__ = ["FakeDiarizer"]


@DiarizationRegistry.register("fake")
class FakeDiarizer(BaseDiarizer):
    hbm_required_gb = 0.0

    def __init__(
        self,
        config: DiarizationConfig | None = None,
        n_speakers: int = 2,
        turn_seconds: float = 10.0,
    ):
        super().__init__()
        self.config = config or DiarizationConfig()
        self.n_speakers = n_speakers
        self.turn_seconds = turn_seconds
        self._loaded = True

    def diarize(
        self, audio: np.ndarray | str, sample_rate: int | None = None, **kw: Any
    ) -> list[TranscriptSegment]:
        wav, sr = decode_audio(audio, sample_rate)
        duration = len(wav) / sr
        out: list[TranscriptSegment] = []
        t, i = 0.0, 0
        while t < duration:
            end = min(t + self.turn_seconds, duration)
            out.append(
                TranscriptSegment(
                    text="", start=round(t, 3), end=round(end, 3),
                    speaker=f"SPEAKER_{i % self.n_speakers:02d}",
                )
            )
            t, i = end, i + 1
        return out
