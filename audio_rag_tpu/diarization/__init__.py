from audio_rag_tpu.diarization.base import DiarizationRegistry

from audio_rag_tpu.diarization import clustering as _clustering  # noqa: F401
from audio_rag_tpu.diarization import ahc as _ahc  # noqa: F401
from audio_rag_tpu.diarization import fake as _fake  # noqa: F401

__all__ = ["DiarizationRegistry"]
