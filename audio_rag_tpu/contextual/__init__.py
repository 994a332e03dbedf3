from audio_rag_tpu.contextual.processor import ContextualProcessor

__all__ = ["ContextualProcessor"]
