"""Stage tracing + device profiling hooks.

SURVEY.md §5: the reference has no tracer — only ``@timed`` logs and an
``X-Response-Time-Ms`` header. This module adds the TPU-appropriate layer:
named spans that aggregate wall time (feeding ``AudioRAG.status()``) and
optionally wrap stages in ``jax.profiler.TraceAnnotation`` so device traces
(captured with ``start_profile``) attribute work to pipeline stages.
"""

from __future__ import annotations

import contextlib
import threading
import time
from dataclasses import dataclass, field
from typing import Any, Iterator

from audio_rag_tpu.utils.logging import get_logger

log = get_logger(__name__)

__all__ = ["span", "get_trace_summary", "reset_traces", "start_profile",
           "stop_profile", "profiling_active"]


@dataclass
class _SpanStats:
    count: int = 0
    total_s: float = 0.0
    max_s: float = 0.0
    children: dict[str, "_SpanStats"] = field(default_factory=dict)


_lock = threading.Lock()
_stats: dict[str, _SpanStats] = {}
_active = threading.local()
_profiling = False


@contextlib.contextmanager
def span(name: str, **attrs: Any) -> Iterator[None]:
    """Named timing span; nests, aggregates, and annotates device traces."""
    stack = getattr(_active, "stack", None)
    if stack is None:
        stack = _active.stack = []
    parent = stack[-1] if stack else None
    with _lock:
        table = parent.children if parent is not None else _stats
        st = table.setdefault(name, _SpanStats())
    stack.append(st)

    t0 = time.perf_counter()
    annotation = None
    try:
        import jax.profiler

        annotation = jax.profiler.TraceAnnotation(name, **attrs)
        annotation.__enter__()
    except Exception:
        annotation = None
    try:
        yield
    finally:
        if annotation is not None:
            try:
                annotation.__exit__(None, None, None)
            except Exception:
                pass
        dt = time.perf_counter() - t0
        stack.pop()
        with _lock:
            st.count += 1
            st.total_s += dt
            st.max_s = max(st.max_s, dt)


def _to_dict(table: dict[str, _SpanStats]) -> dict[str, Any]:
    return {
        name: {
            "count": s.count,
            "total_s": round(s.total_s, 4),
            "mean_s": round(s.total_s / max(s.count, 1), 4),
            "max_s": round(s.max_s, 4),
            **({"children": _to_dict(s.children)} if s.children else {}),
        }
        for name, s in table.items()
    }


def get_trace_summary() -> dict[str, Any]:
    with _lock:
        return _to_dict(_stats)


def reset_traces() -> None:
    with _lock:
        _stats.clear()


def start_profile(log_dir: str = "/tmp/audio_rag_trace") -> bool:
    """Begin a device trace (viewable in TensorBoard / xprof)."""
    global _profiling
    try:
        import jax.profiler

        jax.profiler.start_trace(log_dir)
        _profiling = True
        log.info("device profiling started → %s", log_dir)
        return True
    except Exception as exc:
        log.warning("profiling unavailable: %s", exc)
        return False


def stop_profile() -> bool:
    global _profiling
    if not _profiling:
        return False
    try:
        import jax.profiler

        jax.profiler.stop_trace()
    finally:
        _profiling = False
    return True


def profiling_active() -> bool:
    return _profiling
