from audio_rag_tpu.engine.engine import InferenceEngine, get_engine

__all__ = ["InferenceEngine", "get_engine"]
