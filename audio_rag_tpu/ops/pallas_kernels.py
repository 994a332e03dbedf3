"""Pallas TPU kernels for the attention hot path.

Flash attention (blocked online-softmax) for the Whisper encoder's
unmasked self-attention over 1500 frames — the single largest FLOP sink in
ingest (SURVEY.md hot loop #1). Logits never materialize in HBM: each
(q-block × k-block) tile is computed in VMEM with running max/sum
renormalization, so HBM traffic is O(T·D) instead of O(T²).

CPU tests run the same kernel under ``interpret=True``; callers fall back
to the einsum path off-TPU or for masked/short sequences
(:func:`attend_auto`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

__all__ = ["flash_attention", "attend_auto", "decode_cross_attention_q8"]


def _decode_cross_kernel(q_ref, k_ref, v_ref, ks_ref, vs_ref, o_ref, *,
                         scale: float):
    """Single-query cross-attention against int8 K/V, dequant in VMEM.

    q_ref (1, hd) f32; k_ref/v_ref (hd, Ta) int8 — TRANSPOSED so the long
    time axis is the lane dimension (int8 min tile is (32, 128); hd=64,
    Ta=1536 tile cleanly); ks/vs (1, 1) f32 per-(b, h) scales; o_ref
    (1, hd) f32. The point is bandwidth: the decode loop re-reads all of
    K/V every token, and int8 halves those bytes while the dequant happens
    in VMEM — XLA's own int8 lowering materializes dequantized copies and
    measured 4.7× SLOWER (docs/PERFORMANCE.md round-2 table). A variant
    processing all heads per grid step (20× fewer invocations) was tried
    and crashes the backend on its non-tile-aligned (H, hd)/(H, 1) blocks;
    this per-(b, h) form is verified on hardware.
    """
    q = q_ref[:].astype(jnp.float32) * (scale * ks_ref[0, 0])
    k = k_ref[:].astype(jnp.float32)  # (hd, Ta)
    s = jnp.dot(q, k, preferred_element_type=jnp.float32)  # (1, Ta)
    s = s - jnp.max(s)
    p = jnp.exp(s)
    p = p / jnp.sum(p)
    v = v_ref[:].astype(jnp.float32)  # (hd, Ta)
    o = jax.lax.dot_general(
        p, v, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (1, hd)
    o_ref[:] = o * vs_ref[0, 0]


@functools.partial(jax.jit, static_argnames=("interpret",))
def decode_cross_attention_q8(
    q: jax.Array,   # (B, H, 1, hd) — the decode step's single query
    k8: jax.Array,  # (B, H, hd, Ta) int8
    v8: jax.Array,  # (B, H, hd, Ta) int8
    ks: jax.Array,  # (B, H, 1, 1) f32
    vs: jax.Array,  # (B, H, 1, 1) f32
    interpret: bool = False,
) -> jax.Array:
    """softmax(q·K/√hd)·V over int8 K/V; returns (B, H, 1, hd) f32."""
    B, H, _, hd = q.shape
    Ta = k8.shape[-1]
    scale = hd ** -0.5
    qf = q.reshape(B * H, 1, hd).astype(jnp.float32)
    out = pl.pallas_call(
        functools.partial(_decode_cross_kernel, scale=scale),
        out_shape=jax.ShapeDtypeStruct((B * H, 1, hd), jnp.float32),
        grid=(B * H,),
        in_specs=[
            pl.BlockSpec((None, 1, hd), lambda b: (b, 0, 0)),
            pl.BlockSpec((None, hd, Ta), lambda b: (b, 0, 0)),
            pl.BlockSpec((None, hd, Ta), lambda b: (b, 0, 0)),
            pl.BlockSpec((None, 1, 1), lambda b: (b, 0, 0)),
            pl.BlockSpec((None, 1, 1), lambda b: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((None, 1, hd), lambda b: (b, 0, 0)),
        interpret=interpret,
    )(qf, k8.reshape(B * H, hd, Ta), v8.reshape(B * H, hd, Ta),
      ks.reshape(B * H, 1, 1), vs.reshape(B * H, 1, 1))
    return out.reshape(B, H, 1, hd)


def on_tpu(x: jax.Array) -> bool:
    """True when ``x`` (or the default backend) lives on a TPU platform."""
    try:
        platform = x.devices().pop().platform if hasattr(x, "devices") \
            else jax.default_backend()
    except Exception:
        platform = jax.default_backend()
    return platform in ("tpu", "axon")


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, *, block_k: int, scale: float):
    """One q-block against all k/v blocks with online softmax.

    q_ref: (block_q, d); k_ref/v_ref: (Tk, d); o_ref: (block_q, d).
    """
    block_q, d = q_ref.shape
    tk = k_ref.shape[0]
    n_kb = tk // block_k

    q = q_ref[:].astype(jnp.float32) * scale

    def body(i, carry):
        acc, m, l = carry
        k = k_ref[pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        v = v_ref[pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        s = jnp.dot(q, k.T, preferred_element_type=jnp.float32)
        m_new = jnp.maximum(m, jnp.max(s, axis=1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l_new = l * alpha + jnp.sum(p, axis=1, keepdims=True)
        acc = acc * alpha + jnp.dot(p, v, preferred_element_type=jnp.float32)
        return acc, m_new, l_new

    acc0 = jnp.zeros((block_q, d), jnp.float32)
    m0 = jnp.full((block_q, 1), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((block_q, 1), jnp.float32)
    acc, m, l = jax.lax.fori_loop(0, n_kb, body, (acc0, m0, l0))
    o_ref[:] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("block_q", "block_k", "interpret")
)
def flash_attention(
    q: jax.Array,  # (B, H, T, D)
    k: jax.Array,
    v: jax.Array,
    block_q: int = 128,
    block_k: int = 128,
    interpret: bool = False,
) -> jax.Array:
    """Unmasked softmax(QKᵀ/√d)·V. T must divide by the block sizes
    (pad beforehand — Whisper's 1500 frames pad to 1536)."""
    B, H, T, D = q.shape
    scale = D ** -0.5
    qf = q.reshape(B * H, T, D)
    kf = k.reshape(B * H, T, D)
    vf = v.reshape(B * H, T, D)

    out = pl.pallas_call(
        functools.partial(_flash_kernel, block_k=block_k, scale=scale),
        out_shape=jax.ShapeDtypeStruct((B * H, T, D), q.dtype),
        grid=(B * H, T // block_q),
        in_specs=[
            pl.BlockSpec((None, block_q, D), lambda b, i: (b, i, 0)),
            pl.BlockSpec((None, T, D), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((None, T, D), lambda b, i: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((None, block_q, D), lambda b, i: (b, i, 0)),
        interpret=interpret,
    )(qf, kf, vf)
    return out.reshape(B, H, T, D)


def _pad_len(t: int, block: int) -> int:
    return ((t + block - 1) // block) * block


def attend_auto(
    q: jax.Array, k: jax.Array, v: jax.Array,
    mask: jax.Array | None = None,
) -> jax.Array | None:
    """Use the Pallas kernel when it applies (TPU, unmasked, long T);
    returns None when the caller should take the einsum path."""
    if mask is not None:
        return None
    B, H, T, D = q.shape
    if T < 256 or D > 256:
        return None
    try:
        platform = q.devices().pop().platform if hasattr(q, "devices") \
            else jax.default_backend()
    except Exception:
        platform = jax.default_backend()
    if platform not in ("tpu", "axon"):
        return None
    Tp = _pad_len(T, 128)
    if Tp != T:
        pad = [(0, 0), (0, 0), (0, Tp - T), (0, 0)]
        # padded keys get -inf logits naturally? No — zero keys give logit 0.
        # Pad keys with a large negative projection instead: simplest is to
        # pad q/k/v with zeros and mask via value zeroing — but zero-logit
        # pads would absorb probability mass. Take the einsum path when T
        # is not block-aligned and the pad fraction is large.
        if (Tp - T) / Tp > 0.1:
            return None
        qp = jnp.pad(q, pad)
        kp = jnp.pad(k, pad)
        vp = jnp.pad(v, pad)
        # suppress padded keys with a -1e30 bias on their logits by giving
        # padded k rows a huge negative component against a constant q dim:
        # cheaper: run kernel then renormalize is incorrect; instead bias
        # via extended dim:
        pad_flag = jnp.zeros((B, H, Tp, 1), q.dtype).at[:, :, T:, :].set(1.0)
        # extra feature dim: real queries carry a constant −1e4 that only
        # pairs with padded keys' √(D+1) indicator → their logits ≈ −1e4,
        # softmax mass ≈ 0; real keys carry 0 there. The kernel scales by
        # (D+1)^-0.5, so real q features are pre-scaled to keep q·k·D^-0.5.
        qp = qp * ((D + 1) / D) ** 0.5
        qp = jnp.concatenate(
            [qp, jnp.full((B, H, Tp, 1), -1e4, q.dtype)], axis=-1
        )
        kp = jnp.concatenate([kp, pad_flag * ((D + 1) ** 0.5)], axis=-1)
        vp = jnp.concatenate(
            [vp, jnp.zeros((B, H, Tp, 1), q.dtype)], axis=-1
        )
        bq, bk = _block_sizes(Tp)
        out = flash_attention(qp, kp, vp, block_q=bq, block_k=bk)
        return out[:, :, :T, :D]
    bq, bk = _block_sizes(T)
    return flash_attention(q, k, v, block_q=bq, block_k=bk)


def _block_sizes(t: int) -> tuple[int, int]:
    """Largest dividing (block_q, block_k) ≤ (256, 512): measured on a v5e,
    256/512 tiles run ~2.5× faster than 128/128 at whisper's 1536 frames
    (fewer grid invocations, fuller MXU tiles)."""
    bq = 256 if t % 256 == 0 else 128
    bk = 512 if t % 512 == 0 else (256 if t % 256 == 0 else 128)
    return bq, bk
