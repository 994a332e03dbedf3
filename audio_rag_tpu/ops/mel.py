"""Whisper-compatible log-mel spectrogram as MXU-friendly matmuls.

Replaces the mel frontend hidden inside CTranslate2 in the reference
(``asr/whisper.py:55-62`` delegates to faster-whisper, which computes the
OpenAI-Whisper log-mel: n_fft=400, hop=160, Hann window, slaney-normalized
mel filterbank, log10 → clamp to max-8 → (x+4)/4).

TPU-first formulation: instead of an FFT (small radix, poorly tiled on TPU),
the windowed DFT is two dense matmuls — ``frames @ (window⊙cos)`` and
``frames @ (window⊙sin)`` with shapes (T, 400) × (400, 201) — which XLA maps
straight onto the MXU and fuses with the following mel projection
(201 × n_mels) and elementwise log. Frame extraction is a gather.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "SAMPLE_RATE",
    "N_FFT",
    "HOP_LENGTH",
    "CHUNK_LENGTH",
    "N_SAMPLES",
    "N_FRAMES",
    "mel_filterbank",
    "log_mel_spectrogram",
    "log_mel_batch",
    "log_mel_sharded",
    "pad_or_trim",
]

SAMPLE_RATE = 16_000
N_FFT = 400
HOP_LENGTH = 160
CHUNK_LENGTH = 30  # seconds per Whisper window
N_SAMPLES = CHUNK_LENGTH * SAMPLE_RATE  # 480_000
N_FRAMES = N_SAMPLES // HOP_LENGTH  # 3000


def _hz_to_mel(freq: np.ndarray | float) -> np.ndarray:
    """Slaney mel scale (librosa htk=False): linear below 1 kHz, log above."""
    freq = np.asarray(freq, dtype=np.float64)
    f_min, f_sp = 0.0, 200.0 / 3
    mels = (freq - f_min) / f_sp
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(
        freq >= min_log_hz,
        min_log_mel + np.log(np.maximum(freq, 1e-10) / min_log_hz) / logstep,
        mels,
    )


def _mel_to_hz(mels: np.ndarray) -> np.ndarray:
    mels = np.asarray(mels, dtype=np.float64)
    f_min, f_sp = 0.0, 200.0 / 3
    freqs = f_min + f_sp * mels
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(
        mels >= min_log_mel,
        min_log_hz * np.exp(logstep * (mels - min_log_mel)),
        freqs,
    )


@functools.lru_cache(maxsize=4)
def mel_filterbank(
    n_mels: int = 128, n_fft: int = N_FFT, sr: int = SAMPLE_RATE
) -> np.ndarray:
    """Slaney-normalized triangular mel filterbank, shape (n_mels, n_fft//2+1).

    Matches ``librosa.filters.mel(sr, n_fft, n_mels)`` (the filters Whisper
    ships in its ``mel_filters.npz`` asset).
    """
    fftfreqs = np.linspace(0.0, sr / 2.0, n_fft // 2 + 1)
    mel_pts = _mel_to_hz(
        np.linspace(_hz_to_mel(0.0), _hz_to_mel(sr / 2.0), n_mels + 2)
    )
    fdiff = np.diff(mel_pts)
    ramps = mel_pts[:, None] - fftfreqs[None, :]
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))
    # Slaney normalization: constant energy per channel
    enorm = 2.0 / (mel_pts[2 : n_mels + 2] - mel_pts[:n_mels])
    weights *= enorm[:, None]
    return weights.astype(np.float32)


@functools.lru_cache(maxsize=2)
def _dft_bases(n_fft: int = N_FFT) -> tuple[np.ndarray, np.ndarray]:
    """Hann-windowed real-DFT bases: (n_fft, n_fft//2+1) cos and -sin."""
    n = np.arange(n_fft)[:, None]
    k = np.arange(n_fft // 2 + 1)[None, :]
    # periodic Hann window, as torch.hann_window(N) used by Whisper
    window = 0.5 * (1.0 - np.cos(2.0 * np.pi * np.arange(n_fft) / n_fft))
    ang = 2.0 * np.pi * n * k / n_fft
    cos_b = (window[:, None] * np.cos(ang)).astype(np.float32)
    sin_b = (window[:, None] * -np.sin(ang)).astype(np.float32)
    return cos_b, sin_b


@functools.partial(jax.jit, static_argnames=("n_mels", "global_norm"))
def log_mel_spectrogram(
    audio: jax.Array, n_mels: int = 128, global_norm: bool = True
) -> jax.Array:
    """Whisper log-mel features, shape (n_mels, n_frames).

    ``audio`` is float32 PCM at 16 kHz with static length (pad beforehand).
    ``n_mels``: 128 for large-v3, 80 for earlier models.
    ``global_norm``: clamp to (max - 8) over this array, as Whisper does over
    the full padded input.
    """
    n = audio.shape[-1]
    n_frames = n // HOP_LENGTH
    # center=True reflect padding of n_fft//2 on both sides
    padded = jnp.pad(audio, (N_FFT // 2, N_FFT // 2), mode="reflect")
    # frame gather: (n_frames, n_fft); whisper drops the trailing frame(s)
    idx = (
        jnp.arange(n_frames)[:, None] * HOP_LENGTH + jnp.arange(N_FFT)[None, :]
    )
    frames = padded[idx]
    # HIGHEST precision: on TPU the default matmul precision is bf16, which
    # is fine for the model but not for feature extraction (WER-sensitive).
    # Cost is negligible next to the encoder (~0.06 TFLOP per audio-hour).
    hp = jax.lax.Precision.HIGHEST
    cos_b, sin_b = _dft_bases(N_FFT)
    re = jnp.dot(frames, jnp.asarray(cos_b), precision=hp)
    im = jnp.dot(frames, jnp.asarray(sin_b), precision=hp)
    power = re * re + im * im  # (n_frames, n_fft//2+1)
    mel = jnp.dot(power, jnp.asarray(mel_filterbank(n_mels).T), precision=hp)
    log_spec = jnp.log10(jnp.maximum(mel, 1e-10))
    if global_norm:
        log_spec = jnp.maximum(log_spec, jnp.max(log_spec) - 8.0)
    log_spec = (log_spec + 4.0) / 4.0
    return log_spec.T  # (n_mels, n_frames)


@functools.partial(jax.jit, static_argnames=("n_mels",))
def log_mel_batch(windows: jax.Array, n_mels: int = 128) -> jax.Array:
    """Per-window log-mel for a batch: (B, n_samples) → (B, n_mels, T).

    One device program for the whole window batch — the per-window host
    loop paid a host↔device round trip (~28 ms relay floor) per 30 s
    window, i.e. ~7 s of pure dispatch tax per audio-hour.
    """
    return jax.vmap(
        lambda a: log_mel_spectrogram(a, n_mels=n_mels)
    )(windows)


def _log_mel_unnormalized(padded: jax.Array, n_frames: int,
                          n_mels: int) -> jax.Array:
    """(n_frames, n_mels) log10 mel from an already-halo-padded signal."""
    idx = (
        jnp.arange(n_frames)[:, None] * HOP_LENGTH
        + jnp.arange(N_FFT)[None, :]
    )
    frames = padded[idx]
    hp = jax.lax.Precision.HIGHEST
    cos_b, sin_b = _dft_bases(N_FFT)
    re = jnp.dot(frames, jnp.asarray(cos_b), precision=hp)
    im = jnp.dot(frames, jnp.asarray(sin_b), precision=hp)
    power = re * re + im * im
    mel = jnp.dot(power, jnp.asarray(mel_filterbank(n_mels).T), precision=hp)
    return jnp.log10(jnp.maximum(mel, 1e-10))


@functools.lru_cache(maxsize=8)
def _sharded_mel_program(mesh, n_data: int, n_mels: int, s_pad: int):
    """Build (and cache) the jitted shard_map program for one
    (mesh, padded-length) shape — a fresh shard_map closure per call
    would retrace every invocation, and each trace costs minutes through
    the remote-compile relay."""
    from jax.sharding import PartitionSpec as P
    from jax.experimental.shard_map import shard_map

    halo = N_FFT // 2
    frames_local = (s_pad // n_data) // HOP_LENGTH

    def shard_fn(chunk):  # (C,) local samples
        chunk = chunk.reshape(-1)
        i = jax.lax.axis_index("data")
        # receive my LEFT halo (the left neighbor's tail) and RIGHT halo
        # (the right neighbor's head); edge shards get zeros and replace
        # them with local reflection (whisper's center padding)
        from_left = jax.lax.ppermute(
            chunk[-halo:], "data",
            [(j, j + 1) for j in range(n_data - 1)])
        from_right = jax.lax.ppermute(
            chunk[:halo], "data",
            [(j, j - 1) for j in range(1, n_data)])
        left = jnp.where(i == 0, chunk[1: halo + 1][::-1], from_left)
        right = jnp.where(i == n_data - 1,
                          chunk[-halo - 1: -1][::-1], from_right)
        padded = jnp.concatenate([left, chunk, right])
        log_spec = _log_mel_unnormalized(padded, frames_local, n_mels)
        gmax = jax.lax.pmax(jnp.max(log_spec), "data")
        log_spec = jnp.maximum(log_spec, gmax - 8.0)
        return ((log_spec + 4.0) / 4.0).T  # (n_mels, frames_local)

    return jax.jit(shard_map(
        shard_fn, mesh=mesh,
        in_specs=P("data"),
        out_specs=P(None, "data"),
    ))


def log_mel_sharded(audio, n_mels: int = 128, mesh=None) -> jax.Array:
    """Time-axis-parallel log-mel for hour-scale audio: the sample axis
    shards over the mesh's ``data`` axis, each chip computes its frames
    shard-local after a halo exchange (SURVEY §2.4 "long audio" row).

    Mechanics: frame i needs samples [i·HOP − N_FFT/2, i·HOP + N_FFT/2),
    so each shard ppermutes its first/last N_FFT/2 samples to its
    neighbors; the global edges reflect locally (whisper's center=True
    padding). Whisper's global max−8 clamp becomes a ``pmax`` across
    shards — bit-matching the unsharded full-file computation (which the
    reference applies over the WHOLE padded input, not per window).
    Output: (n_mels, S/HOP) sharded over frames; per-chip peak memory is
    S/n_data-proportional, flat in file length for a fixed shard budget.

    Production callers: ``asr/whisper_jax.py::WhisperJaxASR._mel_for_batch``
    routes every time-contiguous window batch here when the mesh has >1
    data device (``ASRConfig.mel_sharded``).
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    if mesh is None:
        from audio_rag_tpu.parallel.mesh import get_default_mesh

        mesh = get_default_mesh()
    n_data = int(mesh.shape.get("data", 1))
    audio = jnp.asarray(audio, jnp.float32)
    if n_data == 1:
        return log_mel_spectrogram(audio, n_mels=n_mels)

    S = audio.shape[-1]
    step = n_data * HOP_LENGTH
    S_pad = ((S + step - 1) // step) * step
    if S_pad != S:
        audio = jnp.pad(audio, (0, S_pad - S))
    fn = _sharded_mel_program(mesh, n_data, n_mels, S_pad)
    sharded = jax.device_put(audio, NamedSharding(mesh, P("data")))
    return fn(sharded)


def pad_or_trim(audio: np.ndarray, length: int = N_SAMPLES) -> np.ndarray:
    """Pad with zeros or trim to exactly ``length`` samples (host-side)."""
    if audio.shape[-1] > length:
        return audio[..., :length]
    if audio.shape[-1] < length:
        pad = [(0, 0)] * (audio.ndim - 1) + [(0, length - audio.shape[-1])]
        return np.pad(audio, pad)
    return audio
