"""Beam-reorder permute kernel vs the one-hot matmul / numpy take.

``ops/pallas_kernels.beam_reorder_kv`` restates beam search's self-KV
caches by source beam each step: the gather index feeds the input
BlockSpec's index map (scalar prefetch), so the permutation is pure
block DMAs — no FLOPs, no transpose (see the kernel docstring for the
measured lineage vs the jnp gather and the one-hot matmul). CPU runs it
under ``interpret=True``; the result must equal ``x[:, idx]`` exactly —
a permutation copies bits, so comparisons are exact, not approximate.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from audio_rag_tpu.ops.pallas_kernels import beam_reorder_kv


@pytest.mark.parametrize("dtype", [np.float32, jnp.bfloat16])
@pytest.mark.parametrize("L,N,H,C,hd", [(2, 6, 2, 4, 16), (3, 10, 4, 7, 32)])
def test_matches_numpy_take(L, N, H, C, hd, dtype):
    rng = np.random.default_rng(0)
    sk = rng.standard_normal((L, N, H, C, hd)).astype(jnp.float32)
    sv = rng.standard_normal((L, N, H, C, hd)).astype(jnp.float32)
    sk = jnp.asarray(sk, dtype)
    sv = jnp.asarray(sv, dtype)
    # beam-style index: per-group permutation with repeats (source beams
    # may fan out), including identity rows
    idx = rng.integers(0, N, size=(N,)).astype(np.int32)
    ko, vo = beam_reorder_kv(sk, sv, jnp.asarray(idx), interpret=True)
    np.testing.assert_array_equal(np.asarray(ko), np.asarray(sk)[:, idx])
    np.testing.assert_array_equal(np.asarray(vo), np.asarray(sv)[:, idx])


def test_matches_onehot_matmul():
    """Bit-for-bit agreement with the one-hot einsum the kernel replaces
    in ``beam_decode`` (a 0/1 matmul is exact, so both paths must agree
    exactly — the decode loop's numerics are identical either way)."""
    rng = np.random.default_rng(1)
    L, N, H, C, hd = 2, 8, 2, 4, 64  # H*C*hd = 512, tile-aligned
    sk = jnp.asarray(rng.standard_normal((L, N, H, C, hd)), jnp.bfloat16)
    sv = jnp.asarray(rng.standard_normal((L, N, H, C, hd)), jnp.bfloat16)
    idx = jnp.asarray(rng.integers(0, N, size=(N,)), jnp.int32)
    ko, vo = beam_reorder_kv(sk, sv, idx, interpret=True)
    onehot = jnp.zeros((N, N), sk.dtype).at[jnp.arange(N), idx].set(1)
    rk = jnp.einsum("nb,lbhcd->lnhcd", onehot, sk)
    rv = jnp.einsum("nb,lbhcd->lnhcd", onehot, sv)
    np.testing.assert_array_equal(np.asarray(ko), np.asarray(rk))
    np.testing.assert_array_equal(np.asarray(vo), np.asarray(rv))


def test_rejects_unaligned_lane():
    sk = jnp.zeros((1, 2, 3, 3, 3))
    with pytest.raises(ValueError):
        beam_reorder_kv(sk, sk, jnp.zeros((2,), jnp.int32), interpret=True)
