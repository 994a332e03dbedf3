"""The quality eval must DISCRIMINATE between retrieval configs.

Round-2 verdict: a 24-chunk goldens corpus against ``initial_k=20``
saturates every config (dense ≡ hybrid on every metric, hit rate 1.0) —
such an eval can catch plumbing breakage but never ranking-quality drift.
This suite pins the separation the reference publishes (P@5 0.425 dense →
0.625 hybrid+contextual → 0.675 +HyDE, reference README.md:30-31): with
the 240-chunk synthetic corpus (evaluation/corpus.py) and the committed
TRAINED tiny models (scripts/train_retrieval.py), each retrieval stage
must beat the previous one on the query type that exercises its mechanism.

If a change to tokenization, embedding, sparse extraction, RRF fusion, or
the fused rerank program degrades ranking quality, these orderings break.
"""

import numpy as np
import pytest

from audio_rag_tpu.evaluation.quality import build_eval_engine, \
    run_quality_sweep


@pytest.fixture(scope="module")
def sweep():
    engine, corpus = build_eval_engine()
    try:
        yield run_quality_sweep(engine, corpus.eval_set)
    finally:
        engine.embedder.unload()
        engine.reranker.unload()


def test_corpus_outscales_rerank_pool():
    """240 chunks ≫ initial_k=20: the rerank pool is a real selection,
    not the whole corpus (the round-2 saturation mechanism)."""
    from audio_rag_tpu.evaluation.corpus import make_corpus

    c = make_corpus()
    assert len(c.chunks) >= 200
    assert len(c.eval_set) == 24


def test_trained_assets_are_loaded():
    """The eval models must be the committed trained weights, not random
    init (random init reproduces the round-2 non-separation)."""
    from pathlib import Path

    import audio_rag_tpu

    assets = Path(audio_rag_tpu.__file__).parent / "assets"
    assert (assets / "retr_embedder_small.npz").exists()
    assert (assets / "retr_reranker_small.npz").exists()


def test_hybrid_beats_dense(sweep):
    """Sparse exact-match on rare section tags is hybrid's mechanism:
    tag queries are unanswerable for the dense model (tags are held out
    of its training) and exact IDF-weighted matches for sparse."""
    assert sweep["hybrid"]["mrr"] > sweep["dense"]["mrr"] + 0.10
    assert sweep["hybrid"]["by_type"]["tag"]["mrr"] >= 0.5
    assert sweep["dense"]["by_type"]["tag"]["mrr"] <= 0.2


def test_dense_beats_sparse_on_paraphrase(sweep):
    """Synonym queries share zero surface forms with the chunks — lexical
    matching CANNOT answer them; the trained dense embedder must."""
    assert sweep["dense"]["by_type"]["paraphrase"]["mrr"] >= 0.6
    assert sweep["sparse"]["by_type"]["paraphrase"]["mrr"] <= 0.3


def test_rerank_beats_no_rerank(sweep):
    """Concept-pair queries: one-concept chunks are hard negatives a
    single-vector bi-encoder half-matches; the cross-encoder scores the
    pair jointly and must improve the ordering."""
    assert (sweep["hybrid+rerank"]["by_type"]["pair"]["ndcg"]
            >= sweep["hybrid"]["by_type"]["pair"]["ndcg"])
    assert (sweep["hybrid+rerank"]["mrr"]
            >= sweep["hybrid"]["mrr"] - 1e-6)
    assert (sweep["hybrid+rerank"]["by_type"]["pair"]["mrr"]
            > sweep["hybrid"]["by_type"]["pair"]["mrr"] + 0.05)


def test_not_saturated(sweep):
    """No config may saturate the eval (saturation = the round-2 failure
    mode where every config ties at the ceiling)."""
    for cfg in ("dense", "sparse", "hybrid"):
        assert sweep[cfg]["p_at_5"] < 0.95
    # and the configs genuinely differ pairwise somewhere
    vals = [round(sweep[c]["mrr"], 4)
            for c in ("dense", "sparse", "hybrid", "hybrid+rerank")]
    assert len(set(vals)) >= 3, vals


def test_sweep_deterministic(sweep):
    """Same corpus + committed weights ⇒ bit-stable metrics (the sweep is
    a regression net; nondeterminism would make it flaky)."""
    engine, corpus = build_eval_engine()
    try:
        again = run_quality_sweep(engine, corpus.eval_set)
    finally:
        engine.embedder.unload()
        engine.reranker.unload()
    for cfg in sweep:
        for k in ("p_at_5", "mrr", "ndcg", "hit_rate"):
            assert np.isclose(sweep[cfg][k], again[cfg][k]), (cfg, k)
