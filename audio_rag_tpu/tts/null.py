"""Null TTS: synthesizes a quiet placeholder tone per word.

Stands in for the reference's piper/edge-tts backends (``tts/piper.py``,
``tts/edge.py``) in environments without those engines; produces valid WAV
audio with duration proportional to the text so downstream players and the
API's audio-response path are exercised end-to-end.
"""

from __future__ import annotations

import numpy as np

from audio_rag_tpu.audio.io import wav_bytes
from audio_rag_tpu.config.schema import TTSConfig
from audio_rag_tpu.core.base import BaseTTS
from audio_rag_tpu.tts.base import TTSRegistry

__all__ = ["NullTTS"]


@TTSRegistry.register("null")
class NullTTS(BaseTTS):
    hbm_required_gb = 0.0

    def __init__(self, config: TTSConfig | None = None):
        super().__init__()
        self.config = config or TTSConfig()
        self._loaded = True

    def synthesize(self, text: str, output_path: str | None = None) -> bytes:
        sr = self.config.sample_rate
        n_words = max(1, len(text.split()))
        dur = min(0.25 * n_words, 30.0)
        t = np.arange(int(dur * sr)) / sr
        # soft word-rate amplitude modulation so output is audibly "speechy"
        tone = 0.05 * np.sin(2 * np.pi * 220.0 * t)
        env = 0.5 * (1 + np.sin(2 * np.pi * 4.0 * t))
        data = wav_bytes((tone * env).astype(np.float32), sr)
        if output_path:
            with open(output_path, "wb") as f:
                f.write(data)
        return data
