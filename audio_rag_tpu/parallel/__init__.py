from audio_rag_tpu.parallel.mesh import (
    MeshSpec,
    batch_sharding,
    create_mesh,
    get_default_mesh,
    replicated,
    set_default_mesh,
)

__all__ = [
    "MeshSpec",
    "create_mesh",
    "get_default_mesh",
    "set_default_mesh",
    "batch_sharding",
    "replicated",
]
