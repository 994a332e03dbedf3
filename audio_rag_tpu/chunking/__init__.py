from audio_rag_tpu.chunking.base import ChunkingRegistry, estimate_tokens

from audio_rag_tpu.chunking import speaker_turn as _speaker_turn  # noqa: F401
from audio_rag_tpu.chunking import fixed as _fixed  # noqa: F401
from audio_rag_tpu.chunking import semantic as _semantic  # noqa: F401

__all__ = ["ChunkingRegistry", "estimate_tokens"]
