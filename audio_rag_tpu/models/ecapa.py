"""ECAPA-TDNN speaker encoder (functional JAX) — the real-weights path.

The reference's diarization quality comes from a trained VoxCeleb
speaker encoder (titanet_large via NeMo, reference
``diarization/nemo.py:45-100``). This module implements the
ECAPA-TDNN architecture (Desplanques et al. 2020) exactly as released
in the speechbrain ``spkrec-ecapa-voxceleb`` checkpoint family so a
weight-available deployment can run real speaker embeddings:
``python -m audio_rag_tpu.convert speaker <ckpt_dir> out/`` then set
``diarization.checkpoint_path: out/``.

Faithful inference-mode semantics (pinned by
``tests/unit/models/test_ecapa_parity.py`` against a torch
reimplementation of the published equations):

* TDNN block = Conv1d (reflect "same" padding, dilated) → ReLU →
  BatchNorm (eval mode; folded to per-channel affine at convert time —
  note the BN sits AFTER the activation, so it cannot fold into conv).
* 3 SE-Res2Net blocks (scale 8, dilations 2/3/4): 1×1 TDNN →
  hierarchical Res2Net convs → 1×1 TDNN → squeeze-excitation gate →
  residual add.
* Multi-layer feature aggregation: concat of the 3 block outputs →
  1×1 TDNN (3072 ch).
* Attentive statistics pooling with global context (mean+std concat),
  tanh attention, eps=1e-12 clamped std — then BN affine and a final
  1×1 projection to the 192-d embedding.

TPU notes: everything is batched matmul/conv (MXU); the whole encoder
jits as one program over a window batch. Embeddings are L2-normalized
on output (speaker_embed does the same; speechbrain normalizes at
scoring time instead — cosine rankings are identical).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from audio_rag_tpu.models.layers import Params

__all__ = ["is_ecapa_params", "ecapa_fbank", "ecapa_embed",
           "init_ecapa", "ecapa_emb_dim"]


def is_ecapa_params(params: Params) -> bool:
    return isinstance(params, dict) and "layers" in params and "fc" in params


def ecapa_emb_dim(params: Params) -> int:
    return int(params["fc"]["w"].shape[-1])


# -- feature frontend ------------------------------------------------------

@functools.lru_cache(maxsize=4)
def _htk_mel_filters(n_mels: int, n_fft: int, sr: int) -> np.ndarray:
    """Triangular HTK-scale mel filters, unit peak (speechbrain
    ``Filterbank`` convention — unlike Whisper's slaney-normalized
    bank in ops/mel.py)."""
    def to_mel(f):
        return 2595.0 * np.log10(1.0 + np.asarray(f, np.float64) / 700.0)

    def to_hz(m):
        return 700.0 * (10.0 ** (np.asarray(m, np.float64) / 2595.0) - 1.0)

    freqs = np.fft.rfftfreq(n_fft, 1.0 / sr)
    pts = to_hz(np.linspace(to_mel(0.0), to_mel(sr / 2), n_mels + 2))
    fb = np.zeros((freqs.size, n_mels))
    for i in range(n_mels):
        lo, c, hi = pts[i], pts[i + 1], pts[i + 2]
        up = (freqs - lo) / max(c - lo, 1e-9)
        down = (hi - freqs) / max(hi - c, 1e-9)
        fb[:, i] = np.clip(np.minimum(up, down), 0.0, None)
    return fb.astype(np.float32)


def ecapa_fbank(
    wav: jax.Array, n_mels: int = 80, n_fft: int = 400, hop: int = 160,
    sr: int = 16_000,
) -> jax.Array:
    """(n_samples,) → (T, n_mels) log filterbanks, sentence mean-normed.

    Speechbrain's ``Fbank`` + ``InputNormalization(norm_type=
    "sentence")`` pipeline: hamming-window power STFT → triangular HTK
    mel → dB log (amin 1e-10, 80 dB floor) → per-utterance mean
    subtraction. STFT as two dense matmuls (MXU), like ops/mel.py.
    """
    window = jnp.asarray(np.hamming(n_fft).astype(np.float32))
    n = (wav.shape[0] - n_fft) // hop + 1
    idx = jnp.arange(n)[:, None] * hop + jnp.arange(n_fft)[None, :]
    frames = wav[idx] * window  # (T, n_fft)
    freqs = np.arange(n_fft // 2 + 1)
    angle = 2.0 * np.pi * np.outer(np.arange(n_fft), freqs) / n_fft
    cos_b = jnp.asarray(np.cos(angle).astype(np.float32))
    sin_b = jnp.asarray(np.sin(angle).astype(np.float32))
    power = (frames @ cos_b) ** 2 + (frames @ sin_b) ** 2
    mel = power @ jnp.asarray(_htk_mel_filters(n_mels, n_fft, sr))
    db = 10.0 * jnp.log10(jnp.maximum(mel, 1e-10))
    db = jnp.maximum(db, db.max() - 80.0)
    return db - db.mean(axis=0, keepdims=True)


# -- encoder ---------------------------------------------------------------

def _conv_reflect(p: Params, x: jax.Array, dilation: int,
                  dtype: jnp.dtype) -> jax.Array:
    """Dilated Conv1d with reflect "same" padding (speechbrain
    ``Conv1d`` default ``padding_mode='reflect'``). x (B, T, C)."""
    k = p["w"].shape[0]
    pad = (k - 1) * dilation // 2
    if pad:
        x = jnp.pad(x, ((0, 0), (pad, pad), (0, 0)), mode="reflect")
    y = jax.lax.conv_general_dilated(
        x.astype(dtype), p["w"].astype(dtype),
        window_strides=(1,), padding="VALID",
        rhs_dilation=(dilation,),
        dimension_numbers=("NWC", "WIO", "NWC"),
        preferred_element_type=jnp.float32,
    )
    return y + p["b"]


def _tdnn(p: Params, x: jax.Array, dilation: int,
          dtype: jnp.dtype) -> jax.Array:
    """Conv → ReLU → BN-affine (eval-mode BN folded at convert time)."""
    y = jax.nn.relu(_conv_reflect(p["conv"], x, dilation, dtype))
    return (y * p["bn"]["s"] + p["bn"]["o"]).astype(dtype)


def _res2net(blocks: list[Params], x: jax.Array, dilation: int,
             dtype: jnp.dtype) -> jax.Array:
    """Hierarchical multi-scale convs over channel chunks."""
    scale = len(blocks) + 1
    chunks = jnp.split(x, scale, axis=-1)
    ys = [chunks[0]]
    y = None
    for i in range(1, scale):
        inp = chunks[i] if i == 1 else chunks[i] + y
        y = _tdnn(blocks[i - 1], inp, dilation, dtype)
        ys.append(y)
    return jnp.concatenate(ys, axis=-1)


def _se(p: Params, x: jax.Array, dtype: jnp.dtype) -> jax.Array:
    """Squeeze-excitation over the time-mean context."""
    s = x.mean(axis=1, keepdims=True).astype(dtype)  # (B, 1, C)
    h = jax.nn.relu(s @ p["c1"]["w"].astype(dtype) + p["c1"]["b"])
    g = jax.nn.sigmoid(
        (h @ p["c2"]["w"].astype(dtype) + p["c2"]["b"]).astype(jnp.float32))
    return (x * g).astype(dtype)


def _stats(x: jax.Array, w: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Weighted mean/std over time; eps clamp matches speechbrain
    ``_compute_statistics`` (1e-12)."""
    mean = jnp.sum(w * x, axis=1)
    var = jnp.sum(w * (x - mean[:, None, :]) ** 2, axis=1)
    return mean, jnp.sqrt(jnp.maximum(var, 1e-12))


def ecapa_embed(
    params: Params,
    fbank: jax.Array,  # (B, T, n_mels) from ecapa_fbank
    dtype: jnp.dtype = jnp.bfloat16,
) -> jax.Array:
    """Filterbanks → L2-normalized speaker embeddings (B, emb) fp32."""
    x = _tdnn(params["frontend"], fbank, 1, dtype)
    outs = []
    for i, layer in enumerate(params["layers"]):
        dilation = int(2 + i)  # published ECAPA schedule: 2, 3, 4
        res = x
        if "shortcut" in layer:
            res = _conv_reflect(layer["shortcut"], x, 1, dtype)
        h = _tdnn(layer["tdnn1"], x, 1, dtype)
        h = _res2net(layer["res2net"], h, dilation, dtype)
        h = _tdnn(layer["tdnn2"], h, 1, dtype)
        h = _se(layer["se"], h, dtype)
        x = (h + res).astype(dtype)
        outs.append(x)
    x = _tdnn(params["mfa"], jnp.concatenate(outs, axis=-1), 1, dtype)

    # attentive statistics pooling with global context
    xf = x.astype(jnp.float32)
    t = x.shape[1]
    uniform = jnp.full((1, t, 1), 1.0 / t, jnp.float32)
    g_mean, g_std = _stats(xf, uniform)
    ctx = jnp.concatenate(
        [x,
         jnp.broadcast_to(g_mean[:, None, :], x.shape).astype(dtype),
         jnp.broadcast_to(g_std[:, None, :], x.shape).astype(dtype)],
        axis=-1)
    a = _tdnn(params["asp"]["tdnn"], ctx, 1, dtype)
    a = jnp.tanh(a.astype(jnp.float32)).astype(dtype)
    a = a @ params["asp"]["conv"]["w"].astype(dtype) \
        + params["asp"]["conv"]["b"]
    w = jax.nn.softmax(a.astype(jnp.float32), axis=1)
    mean, std = _stats(xf, w)
    pooled = jnp.concatenate([mean, std], axis=-1)
    pooled = pooled * params["asp_bn"]["s"] + params["asp_bn"]["o"]
    emb = (pooled.astype(dtype) @ params["fc"]["w"].astype(dtype)
           + params["fc"]["b"]).astype(jnp.float32)
    return emb / jnp.maximum(jnp.linalg.norm(emb, axis=-1, keepdims=True),
                             1e-9)


# -- random init (tests / dims probing) ------------------------------------

def init_ecapa(
    key: jax.Array,
    n_mels: int = 80,
    channels: int = 64,
    mfa_channels: int = 192,
    attn_channels: int = 32,
    se_channels: int = 16,
    emb_dim: int = 24,
    scale: int = 4,
    kernel: int = 3,
) -> Params:
    """Random ECAPA tree (tiny defaults for tests; the voxceleb release
    is channels=1024, mfa=3072, attn=128, se=128, emb=192, scale=8)."""
    keys = iter(jax.random.split(key, 64))

    def conv(k, c_in, c_out):
        w = jax.random.normal(next(keys), (k, c_in, c_out), jnp.float32)
        return {"w": w * (k * c_in) ** -0.5,
                "b": jnp.zeros((c_out,), jnp.float32)}

    def bn(c):
        return {"s": jnp.ones((c,), jnp.float32) *
                (1.0 + 0.1 * jax.random.normal(next(keys), (c,))),
                "o": 0.1 * jax.random.normal(next(keys), (c,))}

    def tdnn(k, c_in, c_out):
        return {"conv": conv(k, c_in, c_out), "bn": bn(c_out)}

    def lin(c_in, c_out):
        w = jax.random.normal(next(keys), (c_in, c_out), jnp.float32)
        return {"w": w * c_in ** -0.5, "b": jnp.zeros((c_out,), jnp.float32)}

    width = channels // scale
    layers = []
    for _ in range(3):
        layers.append({
            "tdnn1": tdnn(1, channels, channels),
            "res2net": [tdnn(kernel, width, width)
                        for _ in range(scale - 1)],
            "tdnn2": tdnn(1, channels, channels),
            "se": {"c1": lin(channels, se_channels),
                   "c2": lin(se_channels, channels)},
        })
    return {
        "frontend": tdnn(5, n_mels, channels),
        "layers": layers,
        "mfa": tdnn(1, 3 * channels, mfa_channels),
        "asp": {"tdnn": tdnn(1, 3 * mfa_channels, attn_channels),
                "conv": lin(attn_channels, mfa_channels)},
        "asp_bn": bn(2 * mfa_channels),
        "fc": lin(2 * mfa_channels, emb_dim),
    }
