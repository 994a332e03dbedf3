"""Pin BGE-M3 sparse lexical-weight extraction to FlagEmbedding's documented
semantics (reference ``embeddings/bge.py:112-135`` via
``BGEM3FlagModel._process_token_weights``):

* one entry per UNIQUE token id, weight = MAX over its occurrences;
* special tokens (cls/sep/pad) excluded;
* weights are ReLU outputs of the scalar sparse head on each position.

The expected values are recomputed from first principles (same params, same
padded ids, fp32 forward on host) rather than trusted from the embedder.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audio_rag_tpu.config.schema import EmbeddingConfig
from audio_rag_tpu.embeddings.bge import BGEM3Embedder
from audio_rag_tpu.models.bgem3 import bgem3_forward


@pytest.fixture(scope="module")
def embedder():
    e = BGEM3Embedder(EmbeddingConfig(model="test"))
    e.load()
    return e


def _expected_sparse(embedder, text):
    """FlagEmbedding rule, recomputed independently of _to_sparse."""
    tok = embedder._tok
    seq = tok.encode(text)[: embedder.config.max_length]
    ids = np.array([seq], np.int32)
    mask = np.ones_like(ids)
    params = jax.tree.map(lambda x: jnp.asarray(np.asarray(x)),
                          embedder._params)
    _, w = bgem3_forward(params, embedder.dims, jnp.asarray(ids),
                         jnp.asarray(mask), dtype=jnp.float32)
    w = np.asarray(w)[0]
    specials = {tok.cls_id, tok.sep_id, tok.pad_id}
    pooled = {}
    for pos, tid in enumerate(seq):
        if tid in specials or w[pos] <= 0:
            continue
        pooled[tid] = max(pooled.get(tid, 0.0), float(w[pos]))
    return pooled


def test_max_pool_over_duplicate_tokens(embedder):
    text = "alpha beta alpha gamma alpha beta"
    result = embedder.embed([text])[0]
    got = dict(zip(result.sparse.indices.tolist(),
                   result.sparse.values.tolist()))
    expected = _expected_sparse(embedder, text)
    assert set(got) == set(expected)
    # unique ids only — per-occurrence entries would double-count matches
    assert len(result.sparse.indices) == len(set(result.sparse.indices))
    for tid, wv in expected.items():
        assert got[tid] == pytest.approx(wv, rel=2e-2, abs=1e-3), (
            f"token {tid}: expected max-pooled {wv}, got {got[tid]}"
        )


def test_specials_excluded_and_weights_positive(embedder):
    result = embedder.embed(["kernel trick feature space"])[0]
    tok = embedder._tok
    specials = {tok.cls_id, tok.sep_id, tok.pad_id}
    assert not specials & set(result.sparse.indices.tolist())
    assert all(v > 0 for v in result.sparse.values)


def test_query_and_doc_side_agree(embedder):
    """embed() and embed_query() extract identical sparse terms for the
    same text (the reference uses one extraction path for both sides)."""
    text = "regularization reduces overfitting overfitting"
    d = embedder.embed([text])[0].sparse
    q = embedder.embed_query(text).sparse
    assert dict(zip(d.indices.tolist(), d.values.tolist())) == \
        dict(zip(q.indices.tolist(), q.values.tolist()))
