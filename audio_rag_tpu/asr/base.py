"""ASR registry. Parity: reference ``asr/base.py:6``."""

from audio_rag_tpu.core.base import BaseASR
from audio_rag_tpu.core.registry import Registry

ASRRegistry: Registry[BaseASR] = Registry("asr")

__all__ = ["ASRRegistry"]
