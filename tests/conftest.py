"""Test harness config.

Forces JAX onto a virtual 8-device CPU mesh (SURVEY.md §2.4 → TPU mapping is
validated via sharding on host devices; real-chip runs happen in bench.py).
Must run before the first `import jax` anywhere in the test session.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # override: the shell may pin a TPU platform
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
if "xla_cpu_parallel_codegen_split_count" not in flags:
    # XLA:CPU's parallel LLVM codegen flaked under the full suite on this
    # 1-CPU VM (~600 compiled programs, 10+ live threads): segfaults
    # INSIDE backend_compile_and_load / persistent-cache reads at varying
    # tests, 4/4 full runs, while any subset passed in isolation.
    # Single-threaded codegen ran the identical suite to exit 0.
    flags = flags + " --xla_cpu_parallel_codegen_split_count=1"
os.environ["XLA_FLAGS"] = flags

# The environment's sitecustomize imports jax at interpreter start (before
# this file runs), so env vars alone don't steer platform selection; the
# config update below works because backends initialize lazily on first use.
import jax

jax.config.update("jax_platforms", "cpu")
# Never read/write the persistent compilation cache from the CPU suite:
# CPU executables are AOT-compiled for the build host's exact features, and
# an entry cached by a different machine segfaults when deserialized here
# (utils/jax_cache.enable_compilation_cache also refuses on CPU — this is
# the belt to that suspender).
jax.config.update("jax_compilation_cache_dir", None)

import numpy as np
import pytest


@pytest.fixture(autouse=True, scope="module")
def _bound_live_programs():
    """Clear JAX's compiled-program caches after each test module.

    Single-threaded codegen (the XLA_FLAGS pin above) fixed the r4-era
    full-suite segfaults, but the r5 suite compiles more and larger
    CPU programs (tiny-synth ASR decode loops, the trained eval-small
    LLM) and `backend_compile_and_load` began segfaulting again near the
    end of single-process runs (~650 live executables). Dropping caches
    at module boundaries bounds live programs at subset scale — the
    scale that has always been stable — at the cost of cross-module
    recompiles."""
    yield
    import jax

    jax.clear_caches()


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture
def sample_audio():
    """1 second of a 440 Hz tone at 16 kHz, float32 in [-1, 1]."""
    sr = 16000
    t = np.arange(sr, dtype=np.float32) / sr
    return 0.5 * np.sin(2 * np.pi * 440.0 * t), sr
