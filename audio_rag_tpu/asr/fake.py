"""Deterministic fake ASR backend for pipeline tests.

The reference has no fake model backends (SURVEY.md §4 notes this gap);
this one makes the full ingest path unit-testable without weights: it emits
a fixed words-per-second transcript with exact timings, optionally from a
supplied script.
"""

from __future__ import annotations

from typing import Any

import numpy as np

from audio_rag_tpu.asr.base import ASRRegistry
from audio_rag_tpu.audio.io import decode_audio
from audio_rag_tpu.config.schema import ASRConfig
from audio_rag_tpu.core.base import BaseASR
from audio_rag_tpu.core.types import TranscriptSegment, Word

__all__ = ["FakeASR"]


@ASRRegistry.register("fake")
class FakeASR(BaseASR):
    hbm_required_gb = 0.0

    def __init__(
        self,
        config: ASRConfig | None = None,
        script: list[str] | None = None,
        words_per_second: float = 2.0,
        segment_seconds: float = 5.0,
    ):
        super().__init__()
        self.config = config or ASRConfig()
        self.script = script
        self.words_per_second = words_per_second
        self.segment_seconds = segment_seconds
        self._loaded = True

    def transcribe(
        self,
        audio: np.ndarray | str,
        sample_rate: int | None = None,
        word_timestamps: bool = False,
        **kw: Any,
    ) -> list[TranscriptSegment]:
        wav, sr = decode_audio(audio, sample_rate)
        duration = len(wav) / sr
        segments: list[TranscriptSegment] = []
        t = 0.0
        idx = 0
        while t < duration:
            end = min(t + self.segment_seconds, duration)
            n_words = max(1, int((end - t) * self.words_per_second))
            if self.script:
                text = self.script[len(segments) % len(self.script)]
                words_txt = text.split()
            else:
                words_txt = [f"word{idx + k}" for k in range(n_words)]
                text = " ".join(words_txt)
            step = (end - t) / len(words_txt)
            words = [
                Word(w, round(t + k * step, 3), round(t + (k + 1) * step, 3))
                for k, w in enumerate(words_txt)
            ] if word_timestamps else []
            segments.append(
                TranscriptSegment(text=text, start=round(t, 3),
                                  end=round(end, 3), words=words,
                                  language="en")
            )
            idx += len(words_txt)
            t = end
        return segments
