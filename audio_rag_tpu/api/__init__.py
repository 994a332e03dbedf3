from audio_rag_tpu.api.app import create_app

__all__ = ["create_app"]
