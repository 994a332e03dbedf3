"""Generator registry + factory (``None`` for backend "none", as the
reference's ``generation/base.py:37-61`` contract)."""

from audio_rag_tpu.config.schema import GenerationConfig
from audio_rag_tpu.core.base import BaseGenerator
from audio_rag_tpu.core.registry import Registry

GeneratorRegistry: Registry[BaseGenerator] = Registry("generation")


def create_generator(config: GenerationConfig) -> BaseGenerator | None:
    if config.backend == "none":
        return None
    gen = GeneratorRegistry.create(config.backend, config)
    if config.backend == "llm-jax" and config.use_scheduler:
        from audio_rag_tpu.engine.scheduler import ScheduledGenerator

        return ScheduledGenerator(
            gen, max_batch=config.scheduler_max_batch,
            max_wait_ms=config.scheduler_max_wait_ms,
            mode=config.scheduler_mode,
            n_slots=config.scheduler_slots,
            segment_tokens=config.scheduler_segment_tokens,
            context_tokens=config.scheduler_context_tokens,
            idle_segment_tokens=config.scheduler_idle_segment_tokens,
        )
    return gen


__all__ = ["GeneratorRegistry", "create_generator"]
