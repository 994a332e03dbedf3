"""FastSpeech-class text-to-speech acoustic model in functional JAX, plus an
on-device Griffin-Lim vocoder — the TPU-native replacement for the
reference's external TTS engines (piper's VITS at ``tts/piper.py:16-143``,
edge-tts at ``tts/edge.py:33-108``), which shell out to binaries/services
this environment does not have.

Architecture (non-autoregressive, public FastSpeech recipe):
* character embedding + sinusoid positions → pre-LN transformer encoder
* duration predictor (MLP head over encoder states → log frame counts)
* length regulator: gather-based frame→symbol expansion with STATIC
  ``max_frames`` (no dynamic shapes; everything past the total duration is
  masked) — the TPU-friendly form of FastSpeech's repeat-interleave
* pre-LN transformer decoder over frames → linear mel head + residual
  refiner ("postnet")

TPU-first choices:
* one jittable ``apply_tts`` for both training (teacher durations) and
  inference (predicted durations) — no Python control flow on values
* all sequence lengths are static buckets; batch synthesis of many
  sentences is ONE device program (the reference synthesizes serially
  per request)
* the vocoder (mel → linear magnitude via filterbank pseudo-inverse →
  Griffin-Lim phase recovery) runs entirely on device with
  ``lax.fori_loop`` over FFT iterations; audio never round-trips mid-way.

Mel convention matches :mod:`audio_rag_tpu.ops.mel` (16 kHz, n_fft 400,
hop 160, Slaney filterbank, ``(log10 mel + 4) / 4`` scaling WITHOUT the
global clamp) so TTS targets/outputs are invertible and share the ASR
feature code.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from audio_rag_tpu.models.layers import (
    Params,
    embedding_init,
    layer_norm,
    layer_norm_init,
    linear,
    linear_init,
    mha,
    mha_init,
    mlp,
    mlp_init,
    sinusoid_positions,
)
from audio_rag_tpu.ops.mel import HOP_LENGTH, N_FFT, mel_filterbank

__all__ = [
    "TTSDims",
    "TTS_PRESETS",
    "SYMBOLS",
    "PAD_ID",
    "text_to_ids",
    "init_tts",
    "apply_tts",
    "predict_durations",
    "length_regulate",
    "mel_to_audio",
    "griffin_lim",
]


# -- symbol set --------------------------------------------------------------

#: Character inventory: pad, lowercase letters, digits, space + punctuation.
#: Grapheme-level (piper uses espeak phonemes; graphemes keep the model
#: self-contained in a zero-egress environment — a phonemizer can be slotted
#: in front without changing the model).
SYMBOLS: str = "_abcdefghijklmnopqrstuvwxyz0123456789 .,!?'-:;\""
PAD_ID: int = 0
_SYM_TO_ID = {c: i for i, c in enumerate(SYMBOLS)}


def text_to_ids(text: str, max_len: int) -> np.ndarray:
    """Lowercase + map to symbol ids, pad/truncate to ``max_len`` (int32).

    Unknown characters map to space (the reference's engines likewise
    normalize unsupported characters rather than failing).
    """
    ids = [
        _SYM_TO_ID.get(c, _SYM_TO_ID[" "])
        for c in text.lower()[:max_len]
    ]
    out = np.full((max_len,), PAD_ID, np.int32)
    out[: len(ids)] = ids
    return out


# -- dims --------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class TTSDims:
    n_vocab: int
    d_model: int
    n_heads: int
    n_enc_layer: int
    n_dec_layer: int
    n_mels: int
    max_text: int      # symbol-position table size (texts bucket below this)
    max_frames: int    # frame-position table size (static mel length cap)
    max_dur: int = 32  # per-symbol duration clip (frames)


TTS_PRESETS: dict[str, TTSDims] = {
    # ~1.6 M params — the committed trained asset's shape
    "small": TTSDims(64, 128, 4, 2, 2, 80, 256, 2048),
    # tiny shapes for tests/CI
    "test": TTSDims(64, 32, 2, 1, 1, 16, 16, 64, max_dur=8),
}


# -- init --------------------------------------------------------------------

def _block_init(key: jax.Array, d: int) -> Params:
    k1, k2 = jax.random.split(key)
    return {
        "ln1": layer_norm_init(d),
        "attn": mha_init(k1, d, 1, bias=True),
        "ln_mlp": layer_norm_init(d),
        "mlp": mlp_init(k2, d, d * 4),
    }


def _stack(blocks: list[Params]) -> Params:
    return jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)


def init_tts(key: jax.Array, dims: TTSDims) -> Params:
    k_emb, k_enc, k_dec, k_dur, k_mel, k_ref = jax.random.split(key, 6)
    d = dims.d_model
    kd1, kd2 = jax.random.split(k_dur)
    kr1, kr2 = jax.random.split(k_ref)
    return {
        "emb": embedding_init(k_emb, dims.n_vocab, d),
        "enc_blocks": _stack([
            _block_init(k, d) for k in jax.random.split(k_enc, dims.n_enc_layer)
        ]),
        "enc_ln": layer_norm_init(d),
        "dur": {  # 2-layer MLP → scalar log-duration per symbol
            "h": linear_init(kd1, d, d // 2),
            "ln": layer_norm_init(d // 2),
            "out": linear_init(kd2, d // 2, 1),
        },
        "dec_blocks": _stack([
            _block_init(k, d) for k in jax.random.split(k_dec, dims.n_dec_layer)
        ]),
        "dec_ln": layer_norm_init(d),
        "mel_head": linear_init(k_mel, d, dims.n_mels),
        "refine": {  # residual mel refiner (postnet stand-in, frame-local)
            "h": linear_init(kr1, dims.n_mels, d),
            "ln": layer_norm_init(d),
            "out": linear_init(kr2, d, dims.n_mels, scale=1e-3),
        },
    }


# -- forward -----------------------------------------------------------------

def _run_blocks(blocks: Params, x: jax.Array, n_heads: int,
                mask: jax.Array, dtype: jnp.dtype) -> jax.Array:
    def block(x, p):
        h, _ = mha(p["attn"], layer_norm(p["ln1"], x), n_heads,
                   mask=mask, dtype=dtype)
        x = x + h
        x = x + mlp(p["mlp"], layer_norm(p["ln_mlp"], x), dtype)
        return x, None

    x, _ = jax.lax.scan(block, x, blocks)
    return x


def _encode_text(params: Params, dims: TTSDims, tokens: jax.Array,
                 dtype: jnp.dtype) -> tuple[jax.Array, jax.Array]:
    """tokens (B, S) → (encoder states (B, S, d), log-durations (B, S))."""
    B, S = tokens.shape
    valid = tokens != PAD_ID  # (B, S)
    x = params["emb"]["table"].astype(dtype)[tokens]
    pos = sinusoid_positions(dims.max_text, dims.d_model)[:S]
    x = x + jnp.asarray(pos).astype(dtype)
    attn_mask = valid[:, None, None, :]  # keys only; pad queries are masked out
    x = _run_blocks(params["enc_blocks"], x, dims.n_heads, attn_mask, dtype)
    x = layer_norm(params["enc_ln"], x)
    x = x * valid[:, :, None].astype(x.dtype)
    h = jax.nn.relu(linear(params["dur"]["h"], x, dtype))
    h = layer_norm(params["dur"]["ln"], h)
    log_dur = linear(params["dur"]["out"], h, dtype)[..., 0].astype(jnp.float32)
    return x, log_dur


def predict_durations(dims: TTSDims, log_dur: jax.Array, tokens: jax.Array,
                      speed: float = 1.0) -> jax.Array:
    """Log-durations → integer frame counts (B, S); pads get 0.

    ``speed`` > 1 shortens durations (reference edge-tts exposes a rate
    knob, ``tts/edge.py:64-92``).
    """
    dur = jnp.round(jnp.exp(log_dur) / speed).astype(jnp.int32)
    dur = jnp.clip(dur, 1, dims.max_dur)
    return jnp.where(tokens != PAD_ID, dur, 0)


def length_regulate(enc: jax.Array, durations: jax.Array,
                    max_frames: int) -> tuple[jax.Array, jax.Array]:
    """Expand symbol states to frames by duration (gather, static shape).

    enc (B, S, d), durations (B, S) int32 → (frames (B, F, d),
    frame_valid (B, F) bool) where F = ``max_frames``. Frame ``f`` takes the
    state of the first symbol whose cumulative duration exceeds ``f``;
    frames at or past the total duration are zeroed and flagged invalid.
    """
    ends = jnp.cumsum(durations, axis=1)  # (B, S) exclusive frame ends
    f = jnp.arange(max_frames)[None, :, None]  # (1, F, 1)
    # symbol index for each frame: #ends <= f
    sym_idx = jnp.sum(f >= ends[:, None, :], axis=2)  # (B, F)
    total = ends[:, -1]  # (B,)
    frame_valid = jnp.arange(max_frames)[None, :] < total[:, None]
    sym_idx = jnp.minimum(sym_idx, enc.shape[1] - 1)
    frames = jnp.take_along_axis(enc, sym_idx[:, :, None], axis=1)
    return frames * frame_valid[:, :, None].astype(enc.dtype), frame_valid


@functools.partial(jax.jit, static_argnames=("dims", "dtype", "speed"))
def apply_tts(
    params: Params,
    dims: TTSDims,
    tokens: jax.Array,  # (B, S) int32, 0-padded
    durations: jax.Array | None = None,  # (B, S) teacher durations (training)
    dtype: jnp.dtype = jnp.bfloat16,
    speed: float = 1.0,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Full TTS forward.

    Returns (mel (B, F, n_mels) fp32 in the invertible log-mel scale,
    frame_valid (B, F) bool, log_dur (B, S) fp32). With ``durations`` the
    regulator uses them (teacher forcing for training); otherwise the
    duration predictor's output drives synthesis.
    """
    enc, log_dur = _encode_text(params, dims, tokens, dtype)
    if durations is None:
        durations = predict_durations(dims, log_dur, tokens, speed)
    frames, frame_valid = length_regulate(enc, durations, dims.max_frames)
    pos = sinusoid_positions(dims.max_frames, dims.d_model)
    x = frames + jnp.asarray(pos).astype(frames.dtype)
    attn_mask = frame_valid[:, None, None, :]
    x = _run_blocks(params["dec_blocks"], x, dims.n_heads, attn_mask, dtype)
    x = layer_norm(params["dec_ln"], x)
    mel = linear(params["mel_head"], x, dtype).astype(jnp.float32)
    h = jax.nn.relu(linear(params["refine"]["h"], mel.astype(dtype), dtype))
    h = layer_norm(params["refine"]["ln"], h)
    mel = mel + linear(params["refine"]["out"], h, dtype).astype(jnp.float32)
    mel = mel * frame_valid[:, :, None]
    return mel, frame_valid, log_dur


# -- vocoder -----------------------------------------------------------------

@functools.lru_cache(maxsize=4)
def _mel_pinv(n_mels: int) -> np.ndarray:
    """Moore-Penrose pseudo-inverse of the mel filterbank (n_bins, n_mels)."""
    fb = mel_filterbank(n_mels)  # (n_mels, n_bins)
    return np.linalg.pinv(fb).astype(np.float32)


def _stft(audio: jax.Array, window: jax.Array, n_frames: int) -> jax.Array:
    """(T,) → complex (n_frames, n_fft//2+1); center-padded, hop 160."""
    padded = jnp.pad(audio, (N_FFT // 2, N_FFT // 2))
    idx = (jnp.arange(n_frames)[:, None] * HOP_LENGTH
           + jnp.arange(N_FFT)[None, :])
    return jnp.fft.rfft(padded[idx] * window[None, :], axis=-1)


def _istft(spec: jax.Array, window: jax.Array, n_samples: int) -> jax.Array:
    """complex (n_frames, n_fft//2+1) → (n_samples,) via overlap-add."""
    frames = jnp.fft.irfft(spec, n=N_FFT, axis=-1) * window[None, :]
    n_frames = spec.shape[0]
    total = n_samples + N_FFT  # includes the center padding
    idx = (jnp.arange(n_frames)[:, None] * HOP_LENGTH
           + jnp.arange(N_FFT)[None, :])
    num = jnp.zeros((total,), frames.dtype).at[idx].add(frames)
    den = jnp.zeros((total,), frames.dtype).at[idx].add(
        (window * window)[None, :] * jnp.ones((n_frames, 1), frames.dtype)
    )
    audio = num / jnp.maximum(den, 1e-8)
    return audio[N_FFT // 2: N_FFT // 2 + n_samples]


@functools.partial(jax.jit, static_argnames=("n_iter",))
def griffin_lim(magnitude: jax.Array, n_iter: int = 32) -> jax.Array:
    """Phase recovery: |S| (n_frames, n_bins) → audio (n_frames·hop,).

    Classic Griffin-Lim: alternate ISTFT/STFT projections keeping the
    target magnitude. Runs fully on device (``fori_loop``; rfft lowers to
    XLA). Zero-phase init keeps it deterministic.
    """
    n_frames = magnitude.shape[0]
    n_samples = n_frames * HOP_LENGTH
    window = jnp.asarray(
        0.5 * (1.0 - np.cos(2.0 * np.pi * np.arange(N_FFT) / N_FFT)),
        jnp.float32,
    )
    spec = magnitude.astype(jnp.complex64)

    def body(_, spec):
        audio = _istft(spec, window, n_samples)
        est = _stft(audio, window, n_frames)
        phase = est / jnp.maximum(jnp.abs(est), 1e-8)
        return magnitude * phase

    spec = jax.lax.fori_loop(0, n_iter, body, spec)
    return _istft(spec, window, n_samples)


@functools.partial(jax.jit, static_argnames=("n_iter",))
def mel_to_audio(mel: jax.Array, n_iter: int = 32) -> jax.Array:
    """Invertible log-mel (F, n_mels) → waveform (F·hop,) float32 in [-1, 1].

    Inverts :func:`audio_rag_tpu.ops.mel.log_mel_spectrogram`'s scaling
    (``(log10 mel + 4) / 4`` without the global clamp), maps mel power to
    linear power with the filterbank pseudo-inverse, and recovers phase
    with Griffin-Lim.
    """
    n_mels = mel.shape[-1]
    mel_power = jnp.power(10.0, 4.0 * mel.astype(jnp.float32) - 4.0)
    pinv = jnp.asarray(_mel_pinv(n_mels))
    power = jnp.maximum(jnp.dot(mel_power, pinv.T), 0.0)
    audio = griffin_lim(jnp.sqrt(power), n_iter=n_iter)
    peak = jnp.max(jnp.abs(audio))
    return audio / jnp.maximum(peak, 1e-6) * 0.9
