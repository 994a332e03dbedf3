"""Ordered fallback chains with availability predicates.

Parity: reference ``core/resilience/fallback.py:12-237`` (FallbackChain +
prebuilt ASR/embedding chains keyed on CUDA availability). TPU-first: the
availability predicates probe the JAX device platform and the engine's HBM
budget instead of ``torch.cuda``.
"""

from __future__ import annotations

import logging
from dataclasses import dataclass, field
from typing import Any, Callable, Generic, TypeVar

from audio_rag_tpu.core.exceptions import AudioRAGError

T = TypeVar("T")
log = logging.getLogger(__name__)

__all__ = [
    "FallbackOption",
    "FallbackChain",
    "FallbackExhaustedError",
    "has_tpu",
    "has_hbm_budget",
    "create_asr_fallback_chain",
    "create_embedding_fallback_chain",
]


class FallbackExhaustedError(AudioRAGError):
    """Every option in a fallback chain failed or was unavailable."""


@dataclass
class FallbackOption(Generic[T]):
    name: str
    factory: Callable[[], T]
    #: predicate checked before attempting this option
    available: Callable[[], bool] = lambda: True
    #: free-form descriptor (model size, device, ...)
    meta: dict[str, Any] = field(default_factory=dict)


class FallbackChain(Generic[T]):
    """Try options in order; return the first that is available and succeeds."""

    def __init__(self, name: str, options: list[FallbackOption[T]] | None = None):
        self.name = name
        self.options: list[FallbackOption[T]] = options or []

    def add(
        self,
        name: str,
        factory: Callable[[], T],
        available: Callable[[], bool] = lambda: True,
        **meta: Any,
    ) -> "FallbackChain[T]":
        self.options.append(FallbackOption(name, factory, available, meta))
        return self

    def execute(self) -> tuple[str, T]:
        """Return ``(option_name, result)`` of the first successful option."""
        errors: dict[str, str] = {}
        for opt in self.options:
            try:
                if not opt.available():
                    errors[opt.name] = "unavailable"
                    continue
            except Exception as exc:  # predicate itself failed
                errors[opt.name] = f"availability check failed: {exc}"
                continue
            try:
                result = opt.factory()
                if errors:
                    log.warning(
                        "fallback chain %r degraded to %r (skipped: %s)",
                        self.name, opt.name, errors,
                    )
                return opt.name, result
            except Exception as exc:
                errors[opt.name] = str(exc)
                log.warning("fallback option %r failed: %s", opt.name, exc)
        raise FallbackExhaustedError(
            f"all options exhausted in chain {self.name!r}",
            context={"chain": self.name, "errors": errors},
        )


# -- availability predicates ----------------------------------------------

def has_tpu() -> bool:
    try:
        import jax

        return any(d.platform.startswith(("tpu", "axon")) for d in jax.devices())
    except Exception:
        return False


def has_hbm_budget(required_gb: float) -> Callable[[], bool]:
    """Predicate: the default resource manager can fit ``required_gb``."""

    def check() -> bool:
        try:
            from audio_rag_tpu.resources.manager import get_resource_manager

            return get_resource_manager().can_fit(required_gb)
        except Exception:
            return True  # fail open: let load() raise with a better error

    return check


# -- prebuilt chains (reference fallback.py:170-236) -----------------------

def create_asr_fallback_chain(make_backend: Callable[[str], T]) -> FallbackChain[T]:
    """large-v3 → medium → base → base(cpu), mirroring the reference chain."""
    chain: FallbackChain[T] = FallbackChain("asr")
    chain.add("large-v3", lambda: make_backend("large-v3"),
              available=lambda: has_tpu() and has_hbm_budget(6.0)())
    chain.add("medium", lambda: make_backend("medium"),
              available=lambda: has_tpu() and has_hbm_budget(3.0)())
    chain.add("base", lambda: make_backend("base"), available=has_tpu)
    chain.add("base-cpu", lambda: make_backend("base"))
    return chain


def create_embedding_fallback_chain(
    make_backend: Callable[[str], T]
) -> FallbackChain[T]:
    chain: FallbackChain[T] = FallbackChain("embedding")
    chain.add("bge-m3", lambda: make_backend("bge-m3"),
              available=has_hbm_budget(2.5))
    chain.add("bge-m3-small", lambda: make_backend("bge-m3-small"))
    return chain
