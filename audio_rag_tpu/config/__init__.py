from audio_rag_tpu.config.schema import AudioRAGConfig
from audio_rag_tpu.config.loader import load_config

__all__ = ["AudioRAGConfig", "load_config"]
