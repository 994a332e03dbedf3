"""Cross-cutting decorators: timing, call logging, loaded-state guard.

Parity: reference ``utils/decorators.py:14-86`` (timed/logged/retry/
require_loaded). The retry decorator lives in
:mod:`audio_rag_tpu.core.resilience.retry`; TPU addition: ``timed`` also
feeds a process-wide stage-timing registry used by ``jax.profiler``-adjacent
tooling and the ``/status`` endpoints.
"""

from __future__ import annotations

import functools
import logging
import threading
import time
from collections import defaultdict
from typing import Any, Callable, TypeVar

T = TypeVar("T")
log = logging.getLogger(__name__)

__all__ = ["timed", "logged", "require_loaded", "get_stage_timings",
           "reset_stage_timings"]

_timings_lock = threading.Lock()
_timings: dict[str, list[float]] = defaultdict(list)


def get_stage_timings() -> dict[str, dict[str, float]]:
    """Aggregated wall-times recorded by ``@timed`` (count/total/mean/last)."""
    with _timings_lock:
        out = {}
        for name, samples in _timings.items():
            out[name] = {
                "count": len(samples),
                "total_s": sum(samples),
                "mean_s": sum(samples) / len(samples),
                "last_s": samples[-1],
            }
        return out


def reset_stage_timings() -> None:
    with _timings_lock:
        _timings.clear()


def timed(fn: Callable[..., T]) -> Callable[..., T]:
    """Log + record wall time of each call."""

    @functools.wraps(fn)
    def wrapper(*args: Any, **kwargs: Any) -> T:
        t0 = time.perf_counter()
        try:
            return fn(*args, **kwargs)
        finally:
            dt = time.perf_counter() - t0
            with _timings_lock:
                _timings[fn.__qualname__].append(dt)
            log.debug("%s took %.3fs", fn.__qualname__, dt)

    return wrapper


def logged(fn: Callable[..., T]) -> Callable[..., T]:
    """Log entry/exit (DEBUG) and exceptions (ERROR)."""

    @functools.wraps(fn)
    def wrapper(*args: Any, **kwargs: Any) -> T:
        log.debug("→ %s", fn.__qualname__)
        try:
            result = fn(*args, **kwargs)
        except Exception as exc:
            log.error("✗ %s: %s", fn.__qualname__, exc)
            raise
        log.debug("← %s", fn.__qualname__)
        return result

    return wrapper


def require_loaded(fn: Callable[..., T]) -> Callable[..., T]:
    """Guard a method on a :class:`DeviceBackend` behind ``is_loaded``."""

    @functools.wraps(fn)
    def wrapper(self: Any, *args: Any, **kwargs: Any) -> T:
        self.require_loaded()
        return fn(self, *args, **kwargs)

    return wrapper
