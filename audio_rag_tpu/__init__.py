"""audio_rag_tpu — a TPU-native audio RAG framework.

Capability parity target: `mohammedadnansohail1-pixel/audio-rag` (see SURVEY.md).
The compute path (ASR, embedding, reranking, retrieval scoring, generation) is
JAX/XLA/Pallas on a `jax.sharding.Mesh`; the orchestration layer keeps the
reference's public API surface (`AudioRAG.ingest()/query()`, component
registries, layered YAML config).
"""

__version__ = "0.1.0"

from audio_rag_tpu.core.types import (  # noqa: F401
    AudioChunk,
    EmbeddingResult,
    RetrievalResult,
    SparseVector,
    TranscriptSegment,
    Word,
)


def __getattr__(name):
    # Lazy: importing the facade pulls in JAX; keep `import audio_rag_tpu` cheap.
    if name == "AudioRAG":
        from audio_rag_tpu.pipeline.orchestrator import AudioRAG

        return AudioRAG
    if name == "load_config":
        from audio_rag_tpu.config.loader import load_config

        return load_config
    raise AttributeError(name)
