"""Pallas int8 decode cross-attention kernel vs the einsum reference.

The kernel (``ops/pallas_kernels.decode_cross_attention_q8``) carries the
whisper decode loop's dominant HBM term — re-reading the full cross K/V
every generated token — at int8 width with dequant in VMEM. CPU runs it
under ``interpret=True``; numerics must match the dequantized einsum
exactly (same fp32 math, just tiled).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audio_rag_tpu.ops.pallas_kernels import decode_cross_attention_q8


def _reference(q, k8, v8, ks, vs):
    """Dequantized fp32 einsum on the transposed (B, H, hd, Ta) layout."""
    scale = q.shape[-1] ** -0.5
    k = k8.astype(np.float32) * ks
    v = v8.astype(np.float32) * vs
    s = np.einsum("bhqd,bhdk->bhqk", q.astype(np.float32) * scale, k)
    p = np.exp(s - s.max(axis=-1, keepdims=True))
    p = p / p.sum(axis=-1, keepdims=True)
    return np.einsum("bhqk,bhdk->bhqd", p, v)


@pytest.mark.parametrize("B,H,hd,Ta", [(2, 4, 64, 256), (1, 2, 64, 128)])
def test_kernel_matches_reference(B, H, hd, Ta):
    rng = np.random.default_rng(0)
    q = rng.standard_normal((B, H, 1, hd)).astype(np.float32)
    k8 = rng.integers(-127, 128, (B, H, hd, Ta)).astype(np.int8)
    v8 = rng.integers(-127, 128, (B, H, hd, Ta)).astype(np.int8)
    ks = rng.uniform(0.005, 0.02, (B, H, 1, 1)).astype(np.float32)
    vs = rng.uniform(0.005, 0.02, (B, H, 1, 1)).astype(np.float32)
    got = np.asarray(decode_cross_attention_q8(
        jnp.asarray(q), jnp.asarray(k8), jnp.asarray(v8),
        jnp.asarray(ks), jnp.asarray(vs), interpret=True,
    ))
    ref = _reference(q, k8, v8, ks, vs)
    np.testing.assert_allclose(got, ref, atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("M", [2, 5])
def test_kernel_multi_query_beams(M):
    """M>1 queries per row (beam search: K beams share their group's
    K/V and ride the dot's M dimension) must match the einsum per query."""
    rng = np.random.default_rng(2)
    B, H, hd, Ta = 2, 4, 64, 128
    q = rng.standard_normal((B, H, M, hd)).astype(np.float32)
    k8 = rng.integers(-127, 128, (B, H, hd, Ta)).astype(np.int8)
    v8 = rng.integers(-127, 128, (B, H, hd, Ta)).astype(np.int8)
    ks = rng.uniform(0.005, 0.02, (B, H, 1, 1)).astype(np.float32)
    vs = rng.uniform(0.005, 0.02, (B, H, 1, 1)).astype(np.float32)
    got = np.asarray(decode_cross_attention_q8(
        jnp.asarray(q), jnp.asarray(k8), jnp.asarray(v8),
        jnp.asarray(ks), jnp.asarray(vs), interpret=True,
    ))
    ref = _reference(q, k8, v8, ks, vs)
    np.testing.assert_allclose(got, ref, atol=1e-4, rtol=1e-4)


def test_kernel_head_lane_roundtrip_nonsquare():
    """B≠H and H<128 exercise the padded (hd, 128) head-lane carry —
    every head must land back in its own output row."""
    rng = np.random.default_rng(1)
    B, H, hd, Ta = 3, 5, 64, 128
    q = rng.standard_normal((B, H, 1, hd)).astype(np.float32)
    k8 = rng.integers(-127, 128, (B, H, hd, Ta)).astype(np.int8)
    v8 = rng.integers(-127, 128, (B, H, hd, Ta)).astype(np.int8)
    ks = rng.uniform(0.005, 0.02, (B, H, 1, 1)).astype(np.float32)
    vs = rng.uniform(0.005, 0.02, (B, H, 1, 1)).astype(np.float32)
    got = np.asarray(decode_cross_attention_q8(
        jnp.asarray(q), jnp.asarray(k8), jnp.asarray(v8),
        jnp.asarray(ks), jnp.asarray(vs), interpret=True,
    ))
    ref = _reference(q, k8, v8, ks, vs)
    np.testing.assert_allclose(got, ref, atol=1e-4, rtol=1e-4)


def test_whisper_decode_uses_quantized_path_end_to_end():
    """greedy_decode with cross_kv_quantize picks identical argmax tokens
    (test dims; the einsum fallback runs on CPU, the Pallas kernel on TPU —
    both consume the same transposed int8 layout)."""
    from audio_rag_tpu.models.whisper import (
        WHISPER_PRESETS, SpecialTokens, encode, greedy_decode, init_whisper,
    )

    dims = WHISPER_PRESETS["test"]
    st = SpecialTokens.for_dims(dims)
    params = init_whisper(jax.random.PRNGKey(0), dims)
    rng = np.random.default_rng(0)
    mel = jnp.asarray(
        rng.standard_normal((1, dims.n_mels, 2 * dims.n_audio_ctx)),
        jnp.float32)
    enc = encode(params, dims, mel, dtype=jnp.float32)
    prompt = jnp.asarray(
        [[st.sot, st.lang_base, st.transcribe, st.no_timestamps]], jnp.int32)
    ref = greedy_decode(params, dims, enc, prompt, 6, st.eot,
                        dtype=jnp.float32)
    got = greedy_decode(params, dims, enc, prompt, 6, st.eot,
                        dtype=jnp.float32, cross_kv_quantize=True)
    np.testing.assert_array_equal(np.asarray(ref[0]), np.asarray(got[0]))
