"""ctypes bindings for the native audio runtime (``native/audio_native.cpp``).

Builds lazily with ``make`` on first use (g++ is in the image); every entry
point degrades to the pure-Python implementation when the library is
missing or the build fails, so the package works without a toolchain.
"""

from __future__ import annotations

import ctypes
import subprocess
import threading
from pathlib import Path

import numpy as np

from audio_rag_tpu.utils.logging import get_logger

log = get_logger(__name__)

__all__ = ["get_lib", "native_available", "wav_decode", "resample",
           "energy_vad", "dtw_path", "median_filter"]

_NATIVE_DIR = Path(__file__).resolve().parents[2] / "native"
_LIB_PATH = _NATIVE_DIR / "libaudiorag_audio.so"

_lock = threading.Lock()
_lib: ctypes.CDLL | None = None
_tried = False


def _build() -> bool:
    try:
        proc = subprocess.run(
            ["make", "-C", str(_NATIVE_DIR)],
            capture_output=True, timeout=120,
        )
        if proc.returncode != 0:
            log.warning("native build failed: %s",
                        proc.stderr.decode()[:400])
            return False
        return _LIB_PATH.is_file()
    except Exception as exc:
        log.warning("native build unavailable: %s", exc)
        return False


def get_lib() -> ctypes.CDLL | None:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not _LIB_PATH.is_file() and not _build():
            return None
        try:
            lib = ctypes.CDLL(str(_LIB_PATH))
        except OSError as exc:
            log.warning("failed to load native lib: %s", exc)
            return None
        c_fp = ctypes.POINTER(ctypes.c_float)
        lib.arag_wav_decode.restype = ctypes.c_int
        lib.arag_wav_decode.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t,
            ctypes.POINTER(c_fp),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int32),
        ]
        lib.arag_resample.restype = ctypes.c_int
        lib.arag_resample.argtypes = [
            c_fp, ctypes.c_int64, ctypes.c_int32, ctypes.c_int32,
            ctypes.POINTER(c_fp), ctypes.POINTER(ctypes.c_int64),
        ]
        lib.arag_energy_vad.restype = ctypes.c_int
        lib.arag_energy_vad.argtypes = [
            c_fp, ctypes.c_int64, ctypes.c_int32, ctypes.c_float,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.arag_free.restype = None
        lib.arag_free.argtypes = [ctypes.c_void_p]
        c_i32p = ctypes.POINTER(ctypes.c_int32)
        if hasattr(lib, "arag_dtw_path"):  # older prebuilt .so lacks these
            lib.arag_dtw_path.restype = ctypes.c_int64
            lib.arag_dtw_path.argtypes = [
                c_fp, ctypes.c_int64, ctypes.c_int64, c_i32p, c_i32p,
            ]
            lib.arag_median_filter.restype = ctypes.c_int
            lib.arag_median_filter.argtypes = [
                c_fp, ctypes.c_int64, ctypes.c_int64, ctypes.c_int32, c_fp,
            ]
        _lib = lib
        log.info("native audio runtime loaded (%s)", _LIB_PATH.name)
        return _lib


def native_available() -> bool:
    return get_lib() is not None


def wav_decode(data: bytes) -> tuple[np.ndarray, int] | None:
    """Decode RIFF/WAVE bytes → (mono float32, sample_rate); None on
    unsupported input (caller falls back)."""
    lib = get_lib()
    if lib is None:
        return None
    out = ctypes.POINTER(ctypes.c_float)()
    n = ctypes.c_int64()
    sr = ctypes.c_int32()
    rc = lib.arag_wav_decode(data, len(data), ctypes.byref(out),
                             ctypes.byref(n), ctypes.byref(sr))
    if rc != 0:
        return None
    try:
        arr = np.ctypeslib.as_array(out, shape=(n.value,)).copy()
    finally:
        lib.arag_free(out)
    return arr, int(sr.value)


def resample(audio: np.ndarray, sr_in: int, sr_out: int) -> np.ndarray | None:
    lib = get_lib()
    if lib is None:
        return None
    x = np.ascontiguousarray(audio, np.float32)
    out = ctypes.POINTER(ctypes.c_float)()
    n = ctypes.c_int64()
    rc = lib.arag_resample(
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), x.size,
        sr_in, sr_out, ctypes.byref(out), ctypes.byref(n),
    )
    if rc != 0:
        return None
    try:
        arr = np.ctypeslib.as_array(out, shape=(n.value,)).copy()
    finally:
        lib.arag_free(out)
    return arr


def dtw_path(cost: np.ndarray) -> tuple[np.ndarray, np.ndarray] | None:
    """Native DTW over a (N, M) float32 cost matrix → (token_idx,
    frame_idx) ascending path arrays; None when the library is missing
    (caller falls back to the numpy implementation). Bit-identical
    recurrence and tie-breaking to ``asr/word_timing.dtw_path``."""
    lib = get_lib()
    if lib is None or not hasattr(lib, "arag_dtw_path"):
        return None
    c = np.ascontiguousarray(cost, np.float32)
    n, m = c.shape
    ti = np.empty(n + m, np.int32)
    fi = np.empty(n + m, np.int32)
    k = lib.arag_dtw_path(
        c.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n, m,
        ti.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        fi.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    if k < 0:
        return None
    return ti[:k], fi[:k]


def median_filter(x: np.ndarray, width: int) -> np.ndarray | None:
    """Native edge-padded median filter along the last axis of a (N, M)
    float32 matrix; None when unavailable (caller falls back)."""
    lib = get_lib()
    if lib is None or not hasattr(lib, "arag_median_filter") or x.ndim != 2:
        return None
    c = np.ascontiguousarray(x, np.float32)
    out = np.empty_like(c)
    rc = lib.arag_median_filter(
        c.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        c.shape[0], c.shape[1], width,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return out if rc == 0 else None


def energy_vad(audio: np.ndarray, frame: int,
               threshold_db: float) -> np.ndarray | None:
    lib = get_lib()
    if lib is None:
        return None
    x = np.ascontiguousarray(audio, np.float32)
    nf = x.size // frame
    flags = np.zeros(max(nf, 1), np.uint8)
    n_out = ctypes.c_int64()
    rc = lib.arag_energy_vad(
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), x.size, frame,
        threshold_db,
        flags.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.byref(n_out),
    )
    if rc != 0:
        return None
    return flags[: n_out.value].astype(bool)
