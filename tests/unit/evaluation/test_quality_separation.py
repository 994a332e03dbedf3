"""The quality eval must DISCRIMINATE between retrieval configs.

Round-2 verdict: a 24-chunk goldens corpus against ``initial_k=20``
saturates every config (dense ≡ hybrid on every metric, hit rate 1.0) —
such an eval can catch plumbing breakage but never ranking-quality drift.
This suite pins the separation the reference publishes (P@5 0.425 dense →
0.625 hybrid+contextual → 0.675 +HyDE, reference README.md:30-31): with
the extended synthetic corpus (evaluation/corpus.py — 272 chunks, 40
queries) and the committed TRAINED tiny models
(scripts/train_retrieval.py), each pipeline stage must beat the previous
one on the query type that exercises its mechanism — including the
contextual-header and query-expansion stages of the reference's ladder.

If a change to tokenization, embedding, sparse extraction, RRF fusion,
the fused rerank program, extractive headers, or PRF term mining degrades
ranking quality, these orderings break.
"""

import numpy as np
import pytest

from audio_rag_tpu.evaluation.quality import build_eval_setup, \
    run_quality_sweep


@pytest.fixture(scope="module")
def setup():
    engines, corpus = build_eval_setup()
    try:
        yield engines, corpus
    finally:
        engines["base"].embedder.unload()
        engines["base"].reranker.unload()


@pytest.fixture(scope="module")
def sweep(setup):
    engines, corpus = setup
    return run_quality_sweep(engines, corpus.eval_set)


def test_corpus_outscales_rerank_pool():
    """272 chunks ≫ initial_k=20: the rerank pool is a real selection,
    not the whole corpus (the round-2 saturation mechanism)."""
    from audio_rag_tpu.evaluation.corpus import extend_corpus, make_corpus

    base = make_corpus()
    assert len(base.chunks) >= 200
    assert len(base.eval_set) == 24
    c = extend_corpus(base)
    # appended structures must not perturb base generation (the trained
    # assets were fitted to it)
    assert c.chunks[: len(base.chunks)] == base.chunks
    assert len(c.chunks) > len(base.chunks)
    assert len(c.eval_set) == 40


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
    assert (sweep["hybrid+rerank"]["by_type"]["pair"]["mrr"]
            > sweep["hybrid"]["by_type"]["pair"]["mrr"] + 0.05)


def test_contextual_beats_plain_on_context_queries(sweep):
    """Elliptical detail chunks (the subject named only by the
    neighbouring intro) are unfindable without headers; the extractive
    contextual stage must make them rank — the Anthropic contextual-
    retrieval mechanism the reference's ladder measures."""
    assert (sweep["hybrid+context"]["by_type"]["context"]["p_at_5"]
            > sweep["hybrid"]["by_type"]["context"]["p_at_5"] + 0.05)
    # and headers must not damage the other stages' queries
    for t in ("paraphrase", "tag", "pair"):
        assert (sweep["hybrid+context"]["by_type"][t]["p_at_5"]
                >= sweep["hybrid"]["by_type"][t]["p_at_5"] - 0.05), t
    assert sweep["hybrid+context"]["p_at_5"] >= sweep["hybrid"]["p_at_5"]


def test_prf_beats_no_expansion_on_mismatch_queries(sweep):
    """Vocabulary-mismatch queries (alias term → canonical chunks): PRF
    must mine the canonical term from the bridge docs and reach the
    chunks the raw query cannot — the expansion rung of the ladder."""
    assert (sweep["hybrid+context+prf"]["by_type"]["mismatch"]["p_at_5"]
            > sweep["hybrid+context"]["by_type"]["mismatch"]["p_at_5"]
            + 0.10)
    # anchored mining must not drift the precise/paraphrase queries
    for t in ("paraphrase", "tag", "pair"):
        assert (sweep["hybrid+context+prf"]["by_type"][t]["p_at_5"]
                >= sweep["hybrid+context"]["by_type"][t]["p_at_5"] - 0.05), t
    assert (sweep["hybrid+context+prf"]["p_at_5"]
            >= sweep["hybrid+context"]["p_at_5"])


def test_ladder_monotone(sweep):
    """The reference's published ladder shape: dense → hybrid →
    +contextual → +expansion improves overall P@5 at every rung."""
    ladder = ["dense", "hybrid", "hybrid+context", "hybrid+context+prf"]
    vals = [sweep[c]["p_at_5"] for c in ladder]
    assert all(b >= a for a, b in zip(vals, vals[1:])), vals


def test_not_saturated(sweep):
    """No config may saturate the eval (saturation = the round-2 failure
    mode where every config ties at the ceiling)."""
    for cfg in ("dense", "sparse", "hybrid"):
        assert sweep[cfg]["p_at_5"] < 0.95
    # and the configs genuinely differ pairwise somewhere
    vals = [round(sweep[c]["mrr"], 4)
            for c in ("dense", "sparse", "hybrid", "hybrid+rerank")]
    assert len(set(vals)) >= 3, vals


def test_sweep_deterministic(setup, sweep):
    """Same corpus + committed weights ⇒ bit-stable metrics (the sweep is
    a regression net; nondeterminism would make it flaky)."""
    engines, corpus = setup
    again = run_quality_sweep(engines, corpus.eval_set)
    for cfg in sweep:
        for k in ("p_at_5", "mrr", "ndcg", "hit_rate"):
            assert np.isclose(sweep[cfg][k], again[cfg][k]), (cfg, k)
