from audio_rag_tpu.api.v1.router import register_v1_routes

__all__ = ["register_v1_routes"]
