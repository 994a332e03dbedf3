"""TTS registry + factory. Parity: reference ``tts/base.py:6``."""

from audio_rag_tpu.config.schema import TTSConfig
from audio_rag_tpu.core.base import BaseTTS
from audio_rag_tpu.core.registry import Registry

TTSRegistry: Registry[BaseTTS] = Registry("tts")


def create_tts(config: TTSConfig) -> BaseTTS | None:
    if config.backend in ("none",):
        return None
    return TTSRegistry.create(config.backend, config)


__all__ = ["TTSRegistry", "create_tts"]
