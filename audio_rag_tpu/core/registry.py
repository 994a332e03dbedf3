"""Generic plugin registry with decorator registration.

Parity: reference ``core/registry.py:8-58`` (``Registry[T]`` with
register/create/get/list). Every component family (ASR, diarization,
chunking, embeddings, retrieval, reranking, generation, TTS) exposes one
registry instance so backends are swappable by config key.
"""

from __future__ import annotations

from typing import Callable, Generic, TypeVar

from audio_rag_tpu.core.exceptions import ConfigError

T = TypeVar("T")

__all__ = ["Registry"]


class Registry(Generic[T]):
    """Name → class registry for one component family."""

    def __init__(self, family: str):
        self.family = family
        self._entries: dict[str, type[T]] = {}

    def register(self, name: str) -> Callable[[type[T]], type[T]]:
        """Class decorator: ``@ASRRegistry.register("whisper-jax")``."""

        def deco(cls: type[T]) -> type[T]:
            if name in self._entries and self._entries[name] is not cls:
                raise ConfigError(
                    f"duplicate {self.family} backend {name!r}",
                    context={"family": self.family, "name": name},
                )
            self._entries[name] = cls
            return cls

        return deco

    def get(self, name: str) -> type[T]:
        try:
            return self._entries[name]
        except KeyError:
            raise ConfigError(
                f"unknown {self.family} backend {name!r}; "
                f"registered: {sorted(self._entries)}",
                context={"family": self.family, "name": name},
            ) from None

    def create(self, name: str, *args, **kwargs) -> T:
        return self.get(name)(*args, **kwargs)

    def list(self) -> list[str]:
        return sorted(self._entries)

    def __contains__(self, name: str) -> bool:
        return name in self._entries

    def __repr__(self) -> str:
        return f"Registry({self.family!r}, {self.list()})"
