from audio_rag_tpu.pipeline.orchestrator import AudioRAG

__all__ = ["AudioRAG"]
