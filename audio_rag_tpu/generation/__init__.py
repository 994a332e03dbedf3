from audio_rag_tpu.generation.base import GeneratorRegistry, create_generator

from audio_rag_tpu.generation import llm_jax as _llm_jax  # noqa: F401
from audio_rag_tpu.generation import fake as _fake  # noqa: F401

__all__ = ["GeneratorRegistry", "create_generator"]
