"""NLI entailment scorer: the trained tiny asset must order
entailed > neutral > contradicted — the flip the reranker-sigmoid proxy
cannot produce (a contradiction has maximal lexical overlap and scores
HIGH relevance)."""

import numpy as np
import pytest

from audio_rag_tpu.evaluation.nli import ENTAILMENT, NLIScorer


@pytest.fixture(scope="module")
def nli():
    from audio_rag_tpu.evaluation.nli import _ASSET

    if not _ASSET.exists():
        pytest.skip("nli_small.npz asset missing")
    return NLIScorer()


# in-distribution for the tiny asset's training curriculum
# (scripts/train_nli.py VOCAB_WORDS; real mnli checkpoints generalize past
# this, the tiny asset is a functional stand-in)
PREMISE = "the gradient descent is very fast model training large"
ENTAILED = "gradient descent is fast"
CONTRADICTED = "gradient descent is not fast"
NEUTRAL_H = "kernel variance overfitting regularization"


def test_entailment_orders_correctly(nli):
    e = nli.entailment(PREMISE, ENTAILED)
    c = nli.entailment(PREMISE, CONTRADICTED)
    n = nli.entailment(PREMISE, NEUTRAL_H)
    assert e > c, f"entailed {e} must beat contradicted {c}"
    assert e > n, f"entailed {e} must beat neutral {n}"


def test_contradiction_flips_where_proxy_does_not(nli):
    """The verdict fixture: the relevance proxy scores the contradiction
    ~as high as the entailment (max lexical overlap); real NLI flips."""
    import math

    from audio_rag_tpu.config.schema import RerankingConfig
    from audio_rag_tpu.reranking.bge import BGEReranker

    rr = BGEReranker(RerankingConfig(model="test"))
    rr.load()
    try:
        proxy = [
            1.0 / (1.0 + math.exp(-float(rr.score_pairs(PREMISE, [h])[0])))
            for h in (ENTAILED, CONTRADICTED)
        ]
        nli_scores = [nli.entailment(PREMISE, h)
                      for h in (ENTAILED, CONTRADICTED)]
        # NLI separates the pair far more than the proxy does
        assert (nli_scores[0] - nli_scores[1]) > \
            abs(proxy[0] - proxy[1]) + 0.1
    finally:
        rr.unload()


def test_probs_shape_and_simplex(nli):
    p = nli.probs([PREMISE, PREMISE], [ENTAILED, CONTRADICTED])
    assert p.shape == (2, 3)
    np.testing.assert_allclose(p.sum(axis=1), 1.0, atol=1e-5)
    assert p[0, ENTAILMENT] > p[1, ENTAILMENT]


def test_evaluator_uses_nli(nli):
    from audio_rag_tpu.evaluation.metrics import RAGEvaluator

    ev = RAGEvaluator(nli=nli)
    good = ev.compute_generation_metrics(ENTAILED, PREMISE)
    bad = ev.compute_generation_metrics(CONTRADICTED, PREMISE)
    assert good.entailment_score is not None
    assert good.entailment_score > bad.entailment_score
