"""Shared transformer building blocks (functional JAX).

Design: every block is ``init(key, ...) -> params`` + ``apply(params, x, ...)``
with params as plain dicts of arrays. No framework modules — this keeps the
models trivially shardable (a PartitionSpec tree mirrors the param tree) and
scan/remat-friendly.

Compute dtype is bfloat16 on TPU (MXU-native); params are stored fp32 and
cast at use. Attention uses einsum contractions that XLA maps onto the MXU;
a Pallas flash-attention kernel (ops/pallas_kernels) replaces the naive
softmax path for long sequences on TPU.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

Params = dict[str, Any]

__all__ = [
    "linear_init",
    "linear",
    "layer_norm_init",
    "layer_norm",
    "rms_norm_init",
    "rms_norm",
    "embedding_init",
    "mha_init",
    "mha",
    "mlp_init",
    "mlp",
    "swiglu_init",
    "swiglu",
    "sinusoid_positions",
    "rope_frequencies",
    "apply_rope",
    "make_causal_mask",
]


def _split(key: jax.Array, n: int) -> list[jax.Array]:
    return list(jax.random.split(key, n))


# -- primitives ------------------------------------------------------------

def linear_init(
    key: jax.Array, d_in: int, d_out: int, bias: bool = True,
    scale: float | None = None,
) -> Params:
    scale = scale if scale is not None else d_in ** -0.5
    p: Params = {"w": jax.random.normal(key, (d_in, d_out), jnp.float32) * scale}
    if bias:
        p["b"] = jnp.zeros((d_out,), jnp.float32)
    return p


def linear(p: Params, x: jax.Array, dtype: jnp.dtype = jnp.bfloat16) -> jax.Array:
    y = jnp.dot(x.astype(dtype), p["w"].astype(dtype),
                preferred_element_type=jnp.float32)
    if "b" in p:
        y = y + p["b"]
    return y.astype(dtype)


def quantize_linear(w: jax.Array) -> Params:
    """Per-out-channel symmetric int8 for a (din, dout) weight matrix.

    Returns {"w8" (din, dout) int8, "s" (dout,) f32}. Decode loops are
    weight-read-bound (every token re-reads the full weight stack from
    HBM); int8 halves those bytes and :func:`linear_q8` dequantizes in
    VMEM via the Pallas matmul kernel.
    """
    w = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(w), axis=0)
    s = jnp.maximum(amax, 1e-9) / 127.0
    w8 = jnp.clip(jnp.round(w / s[None, :]), -127, 127).astype(jnp.int8)
    return {"w8": w8, "s": s}


def quantize_linear_q4(w: jax.Array) -> Params:
    """Group-wise symmetric int4 for a (din, dout) weight matrix.

    Returns {"w4" (din/2, dout) int8 — din rows 2r/2r+1 nibble-packed,
    "s" (din/group, dout) f32}. Group size is :func:`~audio_rag_tpu.ops.
    pallas_kernels.q4_group`'s choice for ``din`` (≤128, Q4_0/GPTQ-class
    granularity — per-out-channel scaling alone is far too coarse at 4
    bits). Halves the decode loops' weight bytes again vs int8; this is
    the weight regime the reference itself serves (ollama Q4_K_M).
    """
    from audio_rag_tpu.ops.pallas_kernels import q4_group

    w = w.astype(jnp.float32)
    din, dout = w.shape
    group = q4_group(din)
    g = w.reshape(din // group, group, dout)
    s = jnp.maximum(jnp.max(jnp.abs(g), axis=1), 1e-9) / 7.0
    q = jnp.clip(jnp.round(g / s[:, None, :]), -7, 7).astype(jnp.int8)
    q = q.reshape(din, dout)
    packed = (q[0::2] & jnp.int8(0x0F)) | (q[1::2] << 4)
    return {"w4": packed.astype(jnp.int8), "s": s}


def _dequant_q4(p4: Params) -> jax.Array:
    """Reference dequant of :func:`quantize_linear_q4` output, (din, dout)
    f32 — the same math as the Pallas kernel: exact int4 values × scales
    rounded to bf16, product kept in f32. (On a real TPU the MXU rounds
    the product operand to bf16 — a ≤0.2 % relative difference, ~17×
    below the int4 quantization noise itself; interpret mode and this
    fallback share the unrounded-product semantics exactly.)"""
    w4, s = p4["w4"], p4["s"]
    wi = w4.astype(jnp.int32)
    lo = (wi << 28) >> 28
    hi = wi >> 4
    din = w4.shape[0] * 2
    q = jnp.stack([lo, hi], axis=1).reshape(din, -1)  # re-interleave rows
    group = din // s.shape[0]
    sb = jnp.repeat(s.astype(jnp.bfloat16).astype(jnp.float32), group, axis=0)
    return q.astype(jnp.float32) * sb


def linear_q8(p: Params, p8: Params, x: jax.Array,
              dtype: jnp.dtype = jnp.bfloat16) -> jax.Array:
    """:func:`linear` with quantized weights, dequantized in VMEM on TPU.

    ``p`` supplies the bias; ``p8`` the quantized weights — int8 from
    :func:`quantize_linear` ({"w8", "s"}) or int4 from
    :func:`quantize_linear_q4` ({"w4", "s"}); the kernel is picked by
    key. Measured per matmul on a v5e at decode shapes (B=16): int8
    1.27× faster than bf16 at (1280, 1280), 1.7× at the MLP's
    (1280, 5120)/(5120, 1280). Falls back to a dequantized einsum
    off-TPU or when dims aren't tile-aligned (tests, tiny presets).
    """
    from audio_rag_tpu.ops.pallas_kernels import (
        matmul_q4w,
        matmul_q8w,
        on_tpu,
        q4_tiles,
    )

    *lead, din = x.shape
    wq = p8.get("w4", p8.get("w8"))
    dout = wq.shape[1]
    rows = x.reshape(-1, din)
    n = rows.shape[0]
    if "w4" in p8:
        tiles = q4_tiles(din)
        if (on_tpu(wq) and dout % 128 == 0 and tiles is not None
                and tiles[0] == din // p8["s"].shape[0]):
            npad = -(-n // 16) * 16
            if npad != n:
                rows = jnp.pad(rows, ((0, npad - n), (0, 0)))
            y = matmul_q4w(rows.astype(jnp.bfloat16), p8["w4"], p8["s"])[:n]
        else:
            y = jnp.dot(rows.astype(jnp.bfloat16).astype(jnp.float32),
                        _dequant_q4(p8),
                        preferred_element_type=jnp.float32)
    elif on_tpu(wq) and din % 128 == 0 and dout % 128 == 0:
        npad = -(-n // 16) * 16
        if npad != n:
            rows = jnp.pad(rows, ((0, npad - n), (0, 0)))
        y = matmul_q8w(rows.astype(jnp.bfloat16), p8["w8"], p8["s"])[:n]
    else:
        w = p8["w8"].astype(jnp.float32) * p8["s"][None, :]
        y = jnp.dot(rows.astype(jnp.float32), w,
                    preferred_element_type=jnp.float32)
    y = y.reshape(*lead, dout)
    if "b" in p:
        y = y + p["b"]
    return y.astype(dtype)


def layer_norm_init(dim: int) -> Params:
    return {"g": jnp.ones((dim,), jnp.float32), "b": jnp.zeros((dim,), jnp.float32)}


def layer_norm(p: Params, x: jax.Array, eps: float = 1e-5) -> jax.Array:
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps) * p["g"] + p["b"]
    return y.astype(x.dtype)


def rms_norm_init(dim: int) -> Params:
    return {"g": jnp.ones((dim,), jnp.float32)}


def rms_norm(p: Params, x: jax.Array, eps: float = 1e-6) -> jax.Array:
    xf = x.astype(jnp.float32)
    y = xf * jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
    return (y * p["g"]).astype(x.dtype)


def embedding_init(key: jax.Array, vocab: int, dim: int) -> Params:
    return {"table": jax.random.normal(key, (vocab, dim), jnp.float32) * 0.02}


# -- attention -------------------------------------------------------------

def mha_init(
    key: jax.Array, d_model: int, n_heads: int,
    n_kv_heads: int | None = None, bias: bool = True, kv_bias: bool = False,
) -> Params:
    """Multi-head attention params; GQA when ``n_kv_heads < n_heads``."""
    n_kv = n_kv_heads or n_heads
    head_dim = d_model // n_heads
    kq, kk, kv, ko = _split(key, 4)
    return {
        "q": linear_init(kq, d_model, d_model, bias=bias),
        "k": linear_init(kk, d_model, n_kv * head_dim, bias=kv_bias),
        "v": linear_init(kv, d_model, n_kv * head_dim, bias=bias),
        "o": linear_init(ko, d_model, d_model, bias=bias),
    }


def make_causal_mask(q_len: int, kv_len: int, offset: int = 0) -> jax.Array:
    """(q_len, kv_len) bool mask; True = attend. ``offset`` = #cached tokens."""
    q_pos = jnp.arange(q_len)[:, None] + offset
    kv_pos = jnp.arange(kv_len)[None, :]
    return kv_pos <= q_pos


def _attend(
    q: jax.Array,  # (B, H, Tq, D)
    k: jax.Array,  # (B, Hkv, Tk, D)
    v: jax.Array,  # (B, Hkv, Tk, D)
    mask: jax.Array | None,  # broadcastable to (B, H, Tq, Tk), True=attend
) -> jax.Array:
    n_heads, n_kv = q.shape[1], k.shape[1]
    if n_kv != n_heads:  # GQA: repeat kv heads
        k = jnp.repeat(k, n_heads // n_kv, axis=1)
        v = jnp.repeat(v, n_heads // n_kv, axis=1)
    # Pallas flash path for long unmasked self-attention (Whisper encoder)
    from audio_rag_tpu.ops.pallas_kernels import attend_auto

    flash = attend_auto(q, k, v, mask)
    if flash is not None:
        return flash
    scale = q.shape[-1] ** -0.5
    logits = jnp.einsum(
        "bhqd,bhkd->bhqk", q * scale, k, preferred_element_type=jnp.float32
    )
    if mask is not None:
        # python literal, not jnp scalar: a captured device constant degrades
        # all subsequent dispatches on the TPU runtime
        logits = jnp.where(mask, logits, -1e30)
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", probs, v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


def mha(
    p: Params,
    x: jax.Array,  # (B, Tq, d_model)
    n_heads: int,
    kv_input: jax.Array | None = None,  # cross-attention source (B, Tk, d)
    mask: jax.Array | None = None,
    cache: tuple[jax.Array, jax.Array] | None = None,  # (B,Hkv,Tc,D) k,v
    cache_index: jax.Array | None = None,
    rope: tuple[jax.Array, jax.Array] | None = None,  # (cos, sin) for q/k
    dtype: jnp.dtype = jnp.bfloat16,
    return_weights: bool = False,
) -> tuple[jax.Array, tuple[jax.Array, jax.Array] | None] | tuple[
    jax.Array, tuple[jax.Array, jax.Array] | None, jax.Array
]:
    """MHA with optional cross-attention, KV cache and RoPE.

    With ``cache`` (decode): new k/v are scattered at ``cache_index`` and
    attention runs over the whole (static-size) cache; the returned cache is
    the updated buffer. Without cache: full self/cross attention.
    ``return_weights`` additionally returns fp32 attention probabilities
    (needed for Whisper's cross-attention word-timestamp DTW).
    """
    B, Tq, d_model = x.shape
    head_dim = d_model // n_heads
    src = x if kv_input is None else kv_input

    q = linear(p["q"], x, dtype).reshape(B, Tq, n_heads, head_dim)
    k = linear(p["k"], src, dtype)
    v = linear(p["v"], src, dtype)
    n_kv = k.shape[-1] // head_dim
    k = k.reshape(B, -1, n_kv, head_dim)
    v = v.reshape(B, -1, n_kv, head_dim)

    q = q.transpose(0, 2, 1, 3)  # (B, H, Tq, D)
    k = k.transpose(0, 2, 1, 3)
    v = v.transpose(0, 2, 1, 3)

    if rope is not None:
        # caller passes (cos, sin) for the positions of the *current* tokens
        # (same table applies to q and k: cached k was rotated when written)
        cos, sin = rope
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)

    new_cache = None
    if cache is not None:
        ck, cv = cache
        ck = jax.lax.dynamic_update_slice(ck, k.astype(ck.dtype),
                                          (0, 0, cache_index, 0))
        cv = jax.lax.dynamic_update_slice(cv, v.astype(cv.dtype),
                                          (0, 0, cache_index, 0))
        k, v = ck, cv
        new_cache = (ck, cv)

    if return_weights:
        n_kvh = k.shape[1]
        kk, vv = k, v
        if n_kvh != n_heads:
            kk = jnp.repeat(kk, n_heads // n_kvh, axis=1)
            vv = jnp.repeat(vv, n_heads // n_kvh, axis=1)
        scale = head_dim ** -0.5
        logits = jnp.einsum("bhqd,bhkd->bhqk", q * scale, kk,
                            preferred_element_type=jnp.float32)
        if mask is not None:
            logits = jnp.where(mask, logits, -1e30)
        probs32 = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        out = jnp.einsum("bhqk,bhkd->bhqd", probs32.astype(q.dtype), vv,
                         preferred_element_type=jnp.float32).astype(q.dtype)
        out = out.transpose(0, 2, 1, 3).reshape(B, Tq, d_model)
        return linear(p["o"], out, dtype), new_cache, probs32

    out = _attend(q, k, v, mask)
    out = out.transpose(0, 2, 1, 3).reshape(B, Tq, d_model)
    return linear(p["o"], out, dtype), new_cache


# -- MLPs ------------------------------------------------------------------

def mlp_init(key: jax.Array, d_model: int, d_ff: int, bias: bool = True) -> Params:
    k1, k2 = _split(key, 2)
    return {
        "up": linear_init(k1, d_model, d_ff, bias=bias),
        "down": linear_init(k2, d_ff, d_model, bias=bias),
    }


def mlp(p: Params, x: jax.Array, dtype: jnp.dtype = jnp.bfloat16) -> jax.Array:
    # exact (erf) GELU: Whisper and XLM-R use it; the tanh approximation
    # breaks logit-level parity with released checkpoints
    return linear(
        p["down"],
        jax.nn.gelu(linear(p["up"], x, dtype), approximate=False),
        dtype,
    )


def swiglu_init(key: jax.Array, d_model: int, d_ff: int) -> Params:
    k1, k2, k3 = _split(key, 3)
    return {
        "gate": linear_init(k1, d_model, d_ff, bias=False),
        "up": linear_init(k2, d_model, d_ff, bias=False),
        "down": linear_init(k3, d_ff, d_model, bias=False),
    }


def swiglu(p: Params, x: jax.Array, dtype: jnp.dtype = jnp.bfloat16) -> jax.Array:
    return linear(
        p["down"],
        jax.nn.silu(linear(p["gate"], x, dtype)) * linear(p["up"], x, dtype),
        dtype,
    )


# -- positions -------------------------------------------------------------

def sinusoid_positions(length: int, dim: int) -> np.ndarray:
    """Whisper-style sinusoidal embeddings, (length, dim) fp32."""
    log_timescale = np.log(10000.0) / (dim // 2 - 1)
    inv = np.exp(-log_timescale * np.arange(dim // 2))
    scaled = np.arange(length)[:, None] * inv[None, :]
    return np.concatenate([np.sin(scaled), np.cos(scaled)], axis=1).astype(
        np.float32
    )


def rope_frequencies(
    head_dim: int, max_len: int, theta: float = 10000.0
) -> tuple[np.ndarray, np.ndarray]:
    """(cos, sin) tables of shape (max_len, head_dim//2)."""
    inv = 1.0 / (theta ** (np.arange(0, head_dim, 2) / head_dim))
    t = np.arange(max_len)
    freqs = np.outer(t, inv)
    return np.cos(freqs).astype(np.float32), np.sin(freqs).astype(np.float32)


def apply_rope(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """Rotate (B, H, T, D); cos/sin broadcastable to (..., T, D/2)."""
    x1, x2 = jnp.split(x.astype(jnp.float32), 2, axis=-1)
    out = jnp.concatenate(
        [x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1
    )
    return out.astype(x.dtype)
