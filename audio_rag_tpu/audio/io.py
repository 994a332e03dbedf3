"""Host-side audio decode / validation / resample.

Replaces the reference's ffmpeg/ffprobe subprocess usage
(``queue/validation.py:176-187``) and implicit faster-whisper decoding:
WAV (all PCM widths) and raw float arrays are decoded natively; an ffmpeg
subprocess is used for compressed formats only when the binary exists.
Resampling is polyphase (scipy) on host; device-side resampling for the
streaming path lives in :mod:`audio_rag_tpu.ops.mel`.
"""

from __future__ import annotations

import shutil
import subprocess
import wave
from pathlib import Path

import numpy as np

from audio_rag_tpu.core.exceptions import AudioProcessingError

__all__ = ["decode_audio", "get_duration", "resample", "write_wav"]

TARGET_SR = 16_000


def _decode_wav(path: Path) -> tuple[np.ndarray, int]:
    # native fast path (C++ decoder; audio_rag_tpu/native)
    try:
        from audio_rag_tpu.native import wav_decode

        result = wav_decode(path.read_bytes())
        if result is not None:
            return result
    except Exception:
        pass
    try:
        with wave.open(str(path), "rb") as wf:
            sr = wf.getframerate()
            n_ch = wf.getnchannels()
            width = wf.getsampwidth()
            raw = wf.readframes(wf.getnframes())
    except (wave.Error, EOFError) as exc:
        raise AudioProcessingError(
            f"invalid WAV file: {path}: {exc}", context={"path": str(path)}
        ) from exc
    if width == 2:
        x = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
    elif width == 4:
        x = np.frombuffer(raw, dtype="<i4").astype(np.float32) / 2147483648.0
    elif width == 1:
        x = (np.frombuffer(raw, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
    elif width == 3:
        b = np.frombuffer(raw, dtype=np.uint8).reshape(-1, 3)
        x = (
            (b[:, 0].astype(np.int32))
            | (b[:, 1].astype(np.int32) << 8)
            | (b[:, 2].astype(np.int32) << 16)
        )
        x = (x - ((x & 0x800000) << 1)).astype(np.float32) / 8388608.0
    else:
        raise AudioProcessingError(
            f"unsupported WAV sample width {width}", context={"path": str(path)}
        )
    if n_ch > 1:
        x = x.reshape(-1, n_ch).mean(axis=1)
    return x, sr


def _decode_ffmpeg(path: Path, sr: int) -> tuple[np.ndarray, int]:
    ffmpeg = shutil.which("ffmpeg")
    if not ffmpeg:
        raise AudioProcessingError(
            f"cannot decode {path.suffix} without ffmpeg",
            context={"path": str(path), "format": path.suffix},
        )
    cmd = [
        ffmpeg, "-v", "error", "-i", str(path),
        "-f", "f32le", "-ac", "1", "-ar", str(sr), "-",
    ]
    try:
        out = subprocess.run(cmd, capture_output=True, check=True, timeout=600)
    except subprocess.CalledProcessError as exc:
        raise AudioProcessingError(
            f"ffmpeg failed on {path}: {exc.stderr.decode()[:500]}",
            context={"path": str(path)},
        ) from exc
    return np.frombuffer(out.stdout, dtype=np.float32).copy(), sr


def resample(audio: np.ndarray, sr: int, target_sr: int = TARGET_SR) -> np.ndarray:
    """Polyphase resample to ``target_sr`` (identity when already there).

    Uses the native Kaiser-sinc resampler when built; scipy otherwise.
    """
    if sr == target_sr:
        return audio.astype(np.float32, copy=False)
    try:
        from audio_rag_tpu.native import resample as native_resample

        out = native_resample(audio, sr, target_sr)
        if out is not None:
            return out
    except Exception:
        pass
    from math import gcd

    from scipy.signal import resample_poly

    g = gcd(sr, target_sr)
    return resample_poly(audio, target_sr // g, sr // g).astype(np.float32)


def decode_audio(
    path: str | Path | np.ndarray,
    sample_rate: int | None = None,
    target_sr: int = TARGET_SR,
) -> tuple[np.ndarray, int]:
    """Decode any supported input to mono float32 at ``target_sr``.

    Accepts a file path (wav natively; other formats via ffmpeg if present)
    or an ndarray with its ``sample_rate``.
    """
    if isinstance(path, np.ndarray):
        if sample_rate is None:
            raise AudioProcessingError("sample_rate required for ndarray input")
        x = path.astype(np.float32, copy=False)
        if x.ndim > 1:
            x = x.mean(axis=-1)
        return resample(x, sample_rate, target_sr), target_sr

    p = Path(path)
    if not p.is_file():
        raise AudioProcessingError(f"audio file not found: {p}",
                                   context={"path": str(p)})
    if p.suffix.lower() == ".wav":
        x, sr = _decode_wav(p)
    else:
        x, sr = _decode_ffmpeg(p, target_sr)
    return resample(x, sr, target_sr), target_sr


def get_duration(path: str | Path) -> float:
    """Duration in seconds (decodes header only for WAV)."""
    p = Path(path)
    if p.suffix.lower() == ".wav":
        try:
            with wave.open(str(p), "rb") as wf:
                return wf.getnframes() / float(wf.getframerate())
        except (wave.Error, EOFError) as exc:
            raise AudioProcessingError(
                f"invalid WAV file: {p}", context={"path": str(p)}
            ) from exc
    audio, sr = decode_audio(p)
    return len(audio) / sr


def wav_bytes(audio: np.ndarray, sr: int = TARGET_SR) -> bytes:
    """Encode mono float32 [-1, 1] as a 16-bit PCM WAV byte string (the
    single WAV encoder — the TTS backends and file writer all share it)."""
    import io

    pcm = np.clip(audio, -1.0, 1.0)
    pcm = (pcm * 32767.0).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(sr)
        wf.writeframes(pcm.tobytes())
    return buf.getvalue()


def write_wav(path: str | Path, audio: np.ndarray, sr: int = TARGET_SR) -> None:
    """Write mono float32 [-1,1] as 16-bit PCM WAV."""
    Path(path).write_bytes(wav_bytes(audio, sr))
