"""HBM budget manager.

Parity: reference ``resources/manager.py:24-209`` (``ResourceManager`` with
``ensure_vram``/``register_model``/``unload_all``/``status`` implementing an
LRU VRAM allocator). TPU version: same public surface (``ensure_vram`` kept
as an alias of ``ensure_hbm``), but the ledger tracks the engine's hosted
parameter trees and real device memory stats when the backend exposes them.
"""

from __future__ import annotations

import threading
import time
from dataclasses import dataclass, field
from typing import Any, Callable

import jax

from audio_rag_tpu.core.exceptions import ResourceError
from audio_rag_tpu.utils.logging import get_logger

log = get_logger(__name__)

__all__ = ["ModelInfo", "ResourceManager", "get_resource_manager",
           "set_resource_manager"]


@dataclass
class ModelInfo:
    name: str
    hbm_gb: float
    instance: Any  # object exposing .unload()
    last_used: float = field(default_factory=time.monotonic)
    pinned: bool = False


class ResourceManager:
    """LRU budget over registered backends' HBM footprints."""

    def __init__(self, max_hbm_gb: float = 14.0):
        self.max_hbm_gb = max_hbm_gb
        self._models: dict[str, ModelInfo] = {}
        self._lock = threading.RLock()
        #: registrations with these names are born pinned (never evicted —
        #: the mixed-workload serving policy: query-path models stay
        #: resident while ingest swaps its heavyweights around them)
        self.pinned_names: set[str] = set()
        #: evictions performed since process start (observability: the
        #: mixed-workload bench reads this to count swap thrash)
        self.eviction_count = 0

    # -- reference-compatible surface -------------------------------------
    def register_model(self, name: str, hbm_gb: float, instance: Any) -> None:
        with self._lock:
            self._models[name] = ModelInfo(
                name, hbm_gb, instance, pinned=name in self.pinned_names)

    def pin(self, name: str, pinned: bool = True) -> None:
        """Exempt (or re-admit) a registered model from LRU eviction.
        Also applies to FUTURE registrations of ``name`` (reload-safe)."""
        with self._lock:
            if pinned:
                self.pinned_names.add(name)
            else:
                self.pinned_names.discard(name)
            if name in self._models:
                self._models[name].pinned = pinned

    def touch(self, name: str) -> None:
        with self._lock:
            if name in self._models:
                self._models[name].last_used = time.monotonic()

    def unregister(self, name: str) -> None:
        with self._lock:
            self._models.pop(name, None)

    def used_gb(self) -> float:
        with self._lock:
            return sum(m.hbm_gb for m in self._models.values())

    def can_fit(self, required_gb: float) -> bool:
        return required_gb <= self.max_hbm_gb

    def ensure_hbm(self, required_gb: float, for_model: str | None = None) -> None:
        """Evict least-recently-used backends until ``required_gb`` fits.

        Mirrors reference ``ensure_vram`` (manager.py:106-153): eviction calls
        each instance's ``unload()``; raises ResourceError if the budget can
        never fit.
        """
        if required_gb > self.max_hbm_gb:
            raise ResourceError(
                f"model needs {required_gb:.1f} GB but budget is "
                f"{self.max_hbm_gb:.1f} GB",
                context={"required_gb": required_gb,
                         "budget_gb": self.max_hbm_gb},
            )
        with self._lock:
            evicted_any = False
            while self.used_gb() + required_gb > self.max_hbm_gb:
                victims = [
                    m for m in self._models.values()
                    if m.name != for_model and not m.pinned
                ]
                if not victims:
                    raise ResourceError(
                        "cannot free enough HBM (only pinned models "
                        "remain)" if self._models else
                        "cannot free enough HBM",
                        context={"required_gb": required_gb,
                                 "used_gb": self.used_gb(),
                                 "pinned": sorted(self.pinned_names)},
                    )
                victim = min(victims, key=lambda m: m.last_used)
                log.info("evicting %s (%.1f GB) to fit %.1f GB",
                         victim.name, victim.hbm_gb, required_gb)
                self.eviction_count += 1
                try:
                    victim.instance.unload()
                finally:
                    self._models.pop(victim.name, None)
                evicted_any = True
            if evicted_any:
                # drain the async frees before the caller allocates into
                # the freed space (engine.sync docstring: an immediate
                # multi-GB load can race the in-flight deallocations and
                # RESOURCE_EXHAUSTED on a chip whose ledger fits)
                try:
                    from audio_rag_tpu.engine.engine import get_engine

                    get_engine().sync()
                except Exception:  # pragma: no cover
                    pass

    # alias for reference API parity
    ensure_vram = ensure_hbm

    def evict_idle(self, max_idle_s: float) -> list[str]:
        """Unload models unused for ``max_idle_s`` (the reference's
        ``unload_after_idle_seconds`` knob, which it never enforced)."""
        if max_idle_s <= 0:
            return []
        now = time.monotonic()
        evicted: list[str] = []
        with self._lock:
            for m in list(self._models.values()):
                if m.pinned:
                    continue
                if now - m.last_used > max_idle_s:
                    log.info("idle-evicting %s (%.0fs idle)",
                             m.name, now - m.last_used)
                    try:
                        m.instance.unload()
                    finally:
                        self._models.pop(m.name, None)
                        evicted.append(m.name)
        return evicted

    def unload_all(self) -> None:
        with self._lock:
            for m in list(self._models.values()):
                try:
                    m.instance.unload()
                except Exception as exc:  # keep unloading the rest
                    log.warning("unload of %s failed: %s", m.name, exc)
            self._models.clear()

    def status(self) -> dict[str, Any]:
        with self._lock:
            info: dict[str, Any] = {
                "budget_gb": self.max_hbm_gb,
                "used_gb": round(self.used_gb(), 3),
                "models": {
                    m.name: {"gb": m.hbm_gb, "pinned": m.pinned}
                    for m in self._models.values()
                },
                "evictions": self.eviction_count,
            }
        try:  # real device memory when the runtime exposes it
            stats = jax.devices()[0].memory_stats()
            if stats:
                info["device"] = {
                    "bytes_in_use": stats.get("bytes_in_use"),
                    "bytes_limit": stats.get("bytes_limit"),
                }
        except Exception:
            pass
        return info


_lock = threading.Lock()
_manager: ResourceManager | None = None


def get_resource_manager(max_hbm_gb: float | None = None) -> ResourceManager:
    global _manager
    with _lock:
        if _manager is None:
            _manager = ResourceManager(max_hbm_gb or 14.0)
        elif max_hbm_gb is not None:
            _manager.max_hbm_gb = max_hbm_gb
        return _manager


def set_resource_manager(manager: ResourceManager | None) -> None:
    global _manager
    with _lock:
        _manager = manager
