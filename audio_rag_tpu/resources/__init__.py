from audio_rag_tpu.resources.manager import ResourceManager, get_resource_manager

__all__ = ["ResourceManager", "get_resource_manager"]
