"""Flash-attention kernel vs einsum reference (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audio_rag_tpu.ops.pallas_kernels import flash_attention


def reference_attention(q, k, v):
    scale = q.shape[-1] ** -0.5
    s = jnp.einsum("bhqd,bhkd->bhqk", q * scale, k)
    p = jax.nn.softmax(s.astype(jnp.float32), axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p.astype(q.dtype), v)


@pytest.mark.parametrize("T,D", [(256, 64), (384, 128)])
def test_flash_matches_reference(T, D):
    rng = np.random.default_rng(0)
    B, H = 1, 2
    q = jnp.asarray(rng.standard_normal((B, H, T, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, H, T, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, H, T, D)), jnp.float32)
    out = flash_attention(q, k, v, block_q=128, block_k=128, interpret=True)
    ref = reference_attention(q, k, v)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-5
    )


def test_online_softmax_stability():
    """Large logits must not overflow (the running-max path)."""
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.standard_normal((1, 1, 128, 64)) * 30, jnp.float32)
    k = jnp.asarray(rng.standard_normal((1, 1, 128, 64)) * 30, jnp.float32)
    v = jnp.asarray(rng.standard_normal((1, 1, 128, 64)), jnp.float32)
    out = flash_attention(q, k, v, interpret=True)
    assert np.isfinite(np.asarray(out)).all()
    ref = reference_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)


def test_pad_path_matches_reference():
    """attend_auto's indicator-column padding must preserve results for
    non-block-aligned T (verified via the kernel in interpret mode)."""
    from audio_rag_tpu.ops import pallas_kernels as pk

    rng = np.random.default_rng(2)
    B, H, T, D = 1, 2, 300, 64  # pads to 384
    q = jnp.asarray(rng.standard_normal((B, H, T, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, H, T, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, H, T, D)), jnp.float32)

    Tp = 384
    pad = [(0, 0), (0, 0), (0, Tp - T), (0, 0)]
    qp = jnp.pad(q, pad) * ((D + 1) / D) ** 0.5
    kp = jnp.pad(k, pad)
    vp = jnp.pad(v, pad)
    flag = jnp.zeros((B, H, Tp, 1)).at[:, :, T:, :].set(1.0)
    qp = jnp.concatenate([qp, jnp.full((B, H, Tp, 1), -1e4)], axis=-1)
    kp = jnp.concatenate([kp, flag * ((D + 1) ** 0.5)], axis=-1)
    vp = jnp.concatenate([vp, jnp.zeros((B, H, Tp, 1))], axis=-1)
    out = pk.flash_attention(qp, kp, vp, interpret=True)[:, :, :T, :D]
    ref = reference_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=5e-5, rtol=1e-4)
