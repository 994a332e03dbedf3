from audio_rag_tpu.asr.base import ASRRegistry

from audio_rag_tpu.asr import fake as _fake  # noqa: F401
from audio_rag_tpu.asr import whisper_jax as _whisper_jax  # noqa: F401
from audio_rag_tpu.asr import streaming as _streaming  # noqa: F401

__all__ = ["ASRRegistry"]
