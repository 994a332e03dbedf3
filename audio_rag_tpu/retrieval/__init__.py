from audio_rag_tpu.retrieval.base import RetrievalRegistry

# register built-in backends
from audio_rag_tpu.retrieval import tpu_store as _tpu_store  # noqa: F401

__all__ = ["RetrievalRegistry"]
