"""Device mesh construction and canonical shardings.

The reference has no intra-model parallelism (SURVEY.md §2.4): it scales by
running whole jobs on separate GPUs. Here the mesh is a first-class object:
one process owns all chips, every model is compiled against the mesh, and
XLA emits ICI collectives from sharding annotations.

Axes:
* ``data``  — batch-sharded inference/training (DP). ASR windows, embedding
  batches, rerank pairs and vector-store shards ride this axis.
* ``model`` — tensor parallelism (TP) for models whose weights should be
  split (the LLM generator); size 1 on small meshes.
"""

from __future__ import annotations

import threading
from dataclasses import dataclass

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from audio_rag_tpu.core.exceptions import ShardingError

__all__ = [
    "MeshSpec",
    "create_mesh",
    "get_default_mesh",
    "set_default_mesh",
    "batch_sharding",
    "replicated",
    "DATA_AXIS",
    "MODEL_AXIS",
]

DATA_AXIS = "data"
MODEL_AXIS = "model"


@dataclass(frozen=True)
class MeshSpec:
    """Resolved mesh shape: ``data × model`` devices."""

    data: int
    model: int

    @property
    def n_devices(self) -> int:
        return self.data * self.model


def resolve_mesh_spec(
    n_devices: int, data_axis: int = -1, model_axis: int = 1
) -> MeshSpec:
    """Resolve ``-1`` wildcards against the real device count."""
    if model_axis <= 0:
        raise ShardingError(f"model_axis must be positive, got {model_axis}")
    if n_devices % model_axis != 0:
        raise ShardingError(
            f"{n_devices} devices not divisible by model_axis={model_axis}"
        )
    if data_axis == -1:
        data_axis = n_devices // model_axis
    if data_axis * model_axis != n_devices:
        raise ShardingError(
            f"mesh {data_axis}x{model_axis} != {n_devices} devices"
        )
    return MeshSpec(data=data_axis, model=model_axis)


def create_mesh(
    data_axis: int = -1,
    model_axis: int = 1,
    devices: list | None = None,
) -> Mesh:
    """Build a 2-D ``(data, model)`` mesh over the available devices.

    The model axis is innermost so TP collectives ride the fastest ICI links.
    """
    devs = devices if devices is not None else jax.devices()
    spec = resolve_mesh_spec(len(devs), data_axis, model_axis)
    arr = np.asarray(devs).reshape(spec.data, spec.model)
    return Mesh(arr, axis_names=(DATA_AXIS, MODEL_AXIS))


_lock = threading.Lock()
_default_mesh: Mesh | None = None


def get_default_mesh() -> Mesh:
    """Process-wide mesh, created lazily over all devices (model_axis=1)."""
    global _default_mesh
    with _lock:
        if _default_mesh is None:
            _default_mesh = create_mesh()
        return _default_mesh


def set_default_mesh(mesh: Mesh | None) -> None:
    global _default_mesh
    with _lock:
        _default_mesh = mesh


def batch_sharding(mesh: Mesh, ndim: int, axis: int = 0) -> NamedSharding:
    """Shard dimension ``axis`` over the data mesh axis, replicate the rest."""
    spec = [None] * ndim
    spec[axis] = DATA_AXIS
    return NamedSharding(mesh, P(*spec))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def pad_to_multiple(n: int, m: int) -> int:
    """Round ``n`` up to a multiple of ``m`` (static-shape batching helper)."""
    return ((n + m - 1) // m) * m
