from audio_rag_tpu.expansion.hyde import HyDEExpander

__all__ = ["HyDEExpander"]
