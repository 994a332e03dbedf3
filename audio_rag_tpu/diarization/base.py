"""Diarization registry. Parity: reference ``diarization/base.py:6``."""

from audio_rag_tpu.core.base import BaseDiarizer
from audio_rag_tpu.core.registry import Registry

DiarizationRegistry: Registry[BaseDiarizer] = Registry("diarization")

__all__ = ["DiarizationRegistry"]
