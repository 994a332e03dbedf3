"""Direct unit tests for the retrieval scoring ops (numpy-verified)."""

import jax.numpy as jnp
import numpy as np
import pytest

from audio_rag_tpu.ops.similarity import (
    dense_scores,
    rrf_fuse,
    sparse_scores,
    topk_with_mask,
)


class TestDenseScores:
    def test_matches_numpy(self):
        rng = np.random.default_rng(0)
        q = rng.standard_normal((3, 8)).astype(np.float32)
        c = rng.standard_normal((20, 8)).astype(np.float32)
        out = np.asarray(dense_scores(jnp.asarray(q), jnp.asarray(c)))
        np.testing.assert_allclose(out, q @ c.T, atol=1e-5)


class TestSparseScores:
    def test_matches_sparsevector_dot(self):
        from audio_rag_tpu.core.types import SparseVector

        rng = np.random.default_rng(1)
        docs = []
        doc_tok = np.full((6, 8), -1, np.int32)
        doc_w = np.zeros((6, 8), np.float32)
        for d in range(6):
            ids = np.unique(rng.integers(0, 30, size=5)).astype(np.int32)
            vals = rng.random(ids.size).astype(np.float32)
            docs.append(SparseVector(ids, vals))
            doc_tok[d, : ids.size] = ids
            doc_w[d, : ids.size] = vals

        q = SparseVector(np.array([3, 7, 21], np.int32),
                         np.array([1.0, 0.5, 2.0], np.float32))
        q_tok = np.full((1, 4), -1, np.int32)
        q_wt = np.zeros((1, 4), np.float32)
        q_tok[0, :3] = q.indices
        q_wt[0, :3] = q.values

        out = np.asarray(sparse_scores(
            jnp.asarray(q_tok), jnp.asarray(q_wt),
            jnp.asarray(doc_tok), jnp.asarray(doc_w),
        ))[0]
        expected = np.array([q.dot(d) for d in docs])
        np.testing.assert_allclose(out, expected, atol=1e-5)

    def test_padding_tokens_ignored(self):
        doc_tok = np.array([[-1, -1]], np.int32)
        doc_w = np.array([[5.0, 5.0]], np.float32)
        q_tok = np.array([[-1]], np.int32)
        q_wt = np.array([[9.0]], np.float32)
        out = np.asarray(sparse_scores(
            jnp.asarray(q_tok), jnp.asarray(q_wt),
            jnp.asarray(doc_tok), jnp.asarray(doc_w),
        ))
        assert out[0, 0] == 0.0


class TestRRF:
    def test_prefetch_rrf_matches_manual(self):
        # two ranked lists over 6 docs, prefetch 3, k=2.0
        d = jnp.asarray(np.array([[0.9, 0.8, 0.7, 0.6, 0.5, 0.4]],
                                 np.float32))
        s = jnp.asarray(np.array([[0.1, 0.2, 0.9, 0.8, 0.0, 0.0]],
                                 np.float32))
        mask = jnp.ones(6, bool)
        fused = np.asarray(rrf_fuse([d, s], mask, rrf_k=2.0, prefetch=3))[0]
        # dense ranks: doc0=0 doc1=1 doc2=2 (others outside prefetch)
        # sparse ranks: doc2=0 doc3=1 doc1=2
        expect = np.zeros(6)
        expect[0] += 1 / 2
        expect[1] += 1 / 3 + 1 / 4
        expect[2] += 1 / 4 + 1 / 2
        expect[3] += 1 / 3
        np.testing.assert_allclose(fused, expect, atol=1e-6)

    def test_invalid_docs_excluded(self):
        d = jnp.asarray(np.array([[0.9, 0.8]], np.float32))
        mask = jnp.asarray(np.array([False, True]))
        fused = np.asarray(rrf_fuse([d], mask, rrf_k=2.0, prefetch=2))[0]
        assert fused[0] == 0.0
        assert fused[1] == pytest.approx(1 / 2)


class TestTopK:
    def test_mask_pushes_to_neg_inf(self):
        scores = jnp.asarray(np.array([[5.0, 9.0, 7.0]], np.float32))
        mask = jnp.asarray(np.array([True, False, True]))
        vals, idx = topk_with_mask(scores, mask, 2)
        assert idx[0].tolist() == [2, 0]
        assert float(vals[0, 0]) == 7.0
