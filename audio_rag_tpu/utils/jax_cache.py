"""Persistent XLA compilation cache setup.

The TPU runtime in this environment compiles remotely through a relay
(variable, sometimes minutes per program); the persistent cache makes every
program compile once per (code, shape) across processes. Call
:func:`enable_compilation_cache` before building programs — the engine and
bench do this automatically.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), ".jax_cache")

_enabled = False


def apply_platform_env() -> None:
    """Honor ``JAX_PLATFORMS`` even though the environment's sitecustomize
    imports jax at interpreter start (env vars are read then, so later
    processes must re-apply via jax.config). Call from CLI entry points
    before any backend use."""
    plat = os.environ.get("JAX_PLATFORMS")
    if not plat:
        return
    try:
        import jax

        jax.config.update("jax_platforms", plat)
    except Exception:
        pass


def enable_compilation_cache(cache_dir: str | None = None) -> None:
    """Enable the persistent cache — for TPU programs ONLY.

    CPU executables are AOT-compiled against the build host's exact CPU
    features; a cache entry written on one machine SIGILL/segfaults when
    a later process on a different host deserializes it (observed: the
    8-device virtual-CPU test suite died mid-``pjit`` in
    ``compilation_cache.get_executable_and_time`` loading an entry whose
    compile-machine features the host lacked — the ``cpu_aot_loader``
    mismatch warnings are the smoking gun). CPU compiles are fast anyway;
    the cache exists for the minutes-per-program TPU remote relay, so a
    CPU-platform process (tests, ``dryrun_multichip``) skips it.
    """
    global _enabled
    if _enabled:
        return
    import jax

    plat = (jax.config.jax_platforms or "").split(",")[0].lower()
    if plat == "cpu" or os.environ.get("JAX_PLATFORMS", "") == "cpu":
        return
    if not plat:
        # Platform unset: JAX may still RESOLVE to the CPU backend (e.g. a
        # host without the TPU plugin) — caching that writes host-specific
        # CPU AOT executables, the exact cross-host segfault above.
        try:
            if jax.default_backend() == "cpu":
                return
        except Exception:
            return

    d = cache_dir or os.environ.get("AUDIO_RAG_JAX_CACHE", _DEFAULT_DIR)
    try:
        os.makedirs(d, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", d)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        jax.config.update(
            "jax_persistent_cache_min_entry_size_bytes", 0
        )
        _enabled = True
    except Exception:  # cache is an optimization; never fail on it
        pass
