"""int8-weight matmul kernel (``ops/pallas_kernels.matmul_q8w``): the
decode loops' weight matmuls at half HBM width with dequant in VMEM.

CPU runs the kernel under ``interpret=True``; ints ≤127 are exact in
bf16, so the kernel must match the dequantized bf16 einsum bit-for-bit
up to f32 partial-sum grouping.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from audio_rag_tpu.models.layers import linear_q8, quantize_linear
from audio_rag_tpu.ops.pallas_kernels import matmul_q8w


@pytest.mark.parametrize("B,din,dout", [
    (16, 256, 128),
    (16, 1280, 1280),   # whisper large-v3 attention projection
    (32, 256, 640),     # dout needs a non-cap divisor tile
])
def test_kernel_matches_dequant_reference(B, din, dout):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((B, din)).astype(np.float32)
    w8 = rng.integers(-127, 128, (din, dout), dtype=np.int8)
    s = rng.uniform(0.005, 0.02, (dout,)).astype(np.float32)
    got = np.asarray(matmul_q8w(
        jnp.asarray(x), jnp.asarray(w8), jnp.asarray(s), interpret=True))
    xb = jnp.asarray(x).astype(jnp.bfloat16)
    ref = np.asarray(jnp.dot(
        xb, jnp.asarray(w8).astype(jnp.bfloat16),
        preferred_element_type=jnp.float32)) * s[None, :]
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_quantize_linear_roundtrip_error_bounded():
    rng = np.random.default_rng(1)
    w = rng.standard_normal((64, 96)).astype(np.float32) * 0.3
    p8 = quantize_linear(jnp.asarray(w))
    back = np.asarray(p8["w8"], np.float32) * np.asarray(p8["s"])[None, :]
    # symmetric per-out-channel: max error is half a quantization step
    step = np.asarray(p8["s"])[None, :]
    assert np.all(np.abs(back - w) <= 0.5 * step + 1e-7)


def test_linear_q8_fallback_and_bias():
    """Misaligned dims (tiny test models) take the dequant-einsum path and
    still add the bias from the fp params."""
    rng = np.random.default_rng(2)
    w = rng.standard_normal((48, 40)).astype(np.float32) * 0.2
    b = rng.standard_normal((40,)).astype(np.float32)
    x = rng.standard_normal((2, 3, 48)).astype(np.float32)
    p = {"w": jnp.asarray(w), "b": jnp.asarray(b)}
    p8 = quantize_linear(p["w"])
    got = np.asarray(linear_q8(p, p8, jnp.asarray(x), dtype=jnp.float32))
    wq = np.asarray(p8["w8"], np.float32) * np.asarray(p8["s"])[None, :]
    ref = x @ wq + b[None, None, :]
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)
    assert got.shape == (2, 3, 40)
