from audio_rag_tpu.tts.base import TTSRegistry, create_tts

from audio_rag_tpu.tts import null as _null  # noqa: F401
from audio_rag_tpu.tts import external as _external  # noqa: F401
from audio_rag_tpu.tts import jax_tts as _jax_tts  # noqa: F401

__all__ = ["TTSRegistry", "create_tts"]
