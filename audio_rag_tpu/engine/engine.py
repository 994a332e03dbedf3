"""Inference engine: one process owns the TPU mesh; every model family is a
set of compiled programs sharing it.

This replaces the reference's per-component CUDA model loading + VRAM-LRU
juggling (``resources/manager.py:24-209``): device placement happens once per
backend load, programs are jit-compiled against the mesh and cached by
(name, shape bucket), and the HBM ledger is explicit.
"""

from __future__ import annotations

import threading
from dataclasses import dataclass, field
from typing import Any, Callable

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from audio_rag_tpu.config.schema import MeshConfig
from audio_rag_tpu.parallel.mesh import create_mesh
from audio_rag_tpu.utils.jax_cache import enable_compilation_cache
from audio_rag_tpu.utils.logging import get_logger

log = get_logger(__name__)

__all__ = ["InferenceEngine", "get_engine", "set_engine", "bf16_storage"]


def bf16_storage(params: Any) -> Any:
    """Cast a param tree's fp32 leaves to bf16 for device residency.

    Numerically identical to fp32 storage whenever the compute path casts
    weights to bf16 at use (every matmul in models/ does): the cast just
    moves the rounding from dispatch time to load time. What changes is
    HBM: half the footprint, and — decisively for decode loops that
    re-read the full weight set per token — half the bytes per step
    (measured 1.7× on the whisper greedy decode)."""
    return jax.tree.map(
        lambda x: x.astype("bfloat16")
        if getattr(x, "dtype", None) == jax.numpy.float32 else x,
        params,
    )


def _tree_bytes(tree: Any) -> int:
    return sum(
        x.size * x.dtype.itemsize
        for x in jax.tree.leaves(tree)
        if hasattr(x, "dtype")
    )


@dataclass
class _ModelEntry:
    params: Any
    bytes: int
    sharding_spec: Any | None = None


@dataclass
class InferenceEngine:
    """Owns the mesh; hosts parameter trees and a compiled-program cache."""

    mesh: Mesh
    models: dict[str, _ModelEntry] = field(default_factory=dict)
    _programs: dict[tuple, Callable] = field(default_factory=dict)
    _lock: threading.RLock = field(default_factory=threading.RLock)

    @classmethod
    def from_config(cls, cfg: MeshConfig | None = None) -> "InferenceEngine":
        cfg = cfg or MeshConfig()
        enable_compilation_cache()
        devices = None
        if cfg.force_host_device_count:
            devices = jax.devices("cpu")[: cfg.force_host_device_count]
        mesh = create_mesh(cfg.data_axis, cfg.model_axis, devices)
        return cls(mesh=mesh)

    # -- parameter hosting -------------------------------------------------
    def put_params(
        self, name: str, params: Any, spec_tree: Any | None = None
    ) -> Any:
        """Place a param tree on the mesh (replicated unless spec'd); returns
        the device tree and records its HBM footprint."""
        with self._lock:
            if spec_tree is None:
                sharding = NamedSharding(self.mesh, P())
                placed = jax.device_put(params, sharding)
            else:
                placed = jax.tree.map(
                    lambda x, s: jax.device_put(
                        x, NamedSharding(self.mesh, s)
                    ),
                    params,
                    spec_tree,
                )
            entry = _ModelEntry(placed, _tree_bytes(placed), spec_tree)
            self.models[name] = entry
            log.info(
                "engine: hosted %s (%.2f GB on mesh %s)",
                name, entry.bytes / 1e9, dict(zip(self.mesh.axis_names,
                                                  self.mesh.devices.shape)),
            )
            return placed

    def get_params(self, name: str) -> Any:
        return self.models[name].params

    def drop_params(self, name: str) -> None:
        """Release a model's device buffers. Compiled programs are KEPT:
        every builder passes params as explicit arguments (no live-array
        captures), so a program outlives any particular param tree — and
        re-creating one costs minutes of TRACING, which not even the
        persistent compilation cache can skip (measured 350 s to rebuild
        the unrolled whisper decode program on a cache HIT; an evicted-
        then-reloaded whisper re-paid it every ingest pass)."""
        with self._lock:
            entry = self.models.pop(name, None)
            if entry is not None:
                # drop python refs; XLA frees buffers when unreferenced
                del entry

    def sync(self) -> None:
        """Round-trip a trivial device op so queued DEALLOCATIONS drain
        before the caller allocates into the freed space.

        On this runtime buffer frees are asynchronous: after an eviction,
        a large load issued within ~1-2 s can race the in-flight frees and
        RESOURCE_EXHAUSTED even though the post-free ledger fits (measured:
        the whisper→llama swap in the contextual ingest stage failed
        exactly this way while an identical flow with a pause between
        evict and load succeeded). One ~28 ms relay round-trip after the
        free is queued orders the allocation behind it.
        """
        try:
            import jax.numpy as jnp

            jax.block_until_ready(
                jax.device_put(jnp.zeros((8,), jnp.float32)) + 1.0)
        except Exception:  # pragma: no cover - sync is best-effort
            pass

    def drop_programs(self, name: str) -> None:
        """Explicitly invalidate a model's compiled programs (needed only
        if a program's SHAPE contract changes, e.g. a dims swap)."""
        with self._lock:
            self._programs = {
                k: v for k, v in self._programs.items() if k[0] != name
            }

    def hbm_used_gb(self) -> float:
        return sum(m.bytes for m in self.models.values()) / 1e9

    # -- program cache -----------------------------------------------------
    def program(
        self, key: tuple, build: Callable[[], Callable]
    ) -> Callable:
        """Memoized compiled callable for (model, shape-bucket) keys."""
        with self._lock:
            if key not in self._programs:
                self._programs[key] = build()
            return self._programs[key]

    def status(self) -> dict[str, Any]:
        return {
            "mesh": {
                "devices": int(self.mesh.devices.size),
                "shape": dict(
                    zip(self.mesh.axis_names, self.mesh.devices.shape)
                ),
                "platform": self.mesh.devices.flat[0].platform,
            },
            "models": {
                n: {"gb": round(m.bytes / 1e9, 3)}
                for n, m in self.models.items()
            },
            "programs_cached": len(self._programs),
            "hbm_used_gb": round(self.hbm_used_gb(), 3),
        }


_engine_lock = threading.Lock()
_engine: InferenceEngine | None = None


def get_engine(cfg: MeshConfig | None = None) -> InferenceEngine:
    """Process-wide engine singleton (lazily built)."""
    global _engine
    with _engine_lock:
        if _engine is None:
            _engine = InferenceEngine.from_config(cfg)
        return _engine


def set_engine(engine: InferenceEngine | None) -> None:
    global _engine
    with _engine_lock:
        _engine = engine
