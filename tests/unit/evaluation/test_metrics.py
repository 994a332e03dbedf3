import json

import numpy as np
import pytest

from audio_rag_tpu.core.types import RetrievalResult
from audio_rag_tpu.evaluation.dataset import (
    CS229_EVAL_DATASET,
    EvalDataset,
    EvalSample,
)
from audio_rag_tpu.evaluation.metrics import RAGEvaluator


def hits(*texts):
    return [RetrievalResult(t, 1.0 - i * 0.1) for i, t in enumerate(texts)]


class TestRetrievalMetrics:
    def setup_method(self):
        self.ev = RAGEvaluator(k=5)

    def test_perfect_retrieval(self):
        m = self.ev.compute_retrieval_metrics(
            hits("gradient descent is", "the learning rate"),
            ["gradient descent", "learning rate"],
        )
        assert m.precision_at_k == 1.0
        assert m.mrr == 1.0
        assert m.ndcg == 1.0
        assert m.hit_rate == 1.0

    def test_partial_relevance_order_matters(self):
        m_first = self.ev.compute_retrieval_metrics(
            hits("gradient descent", "cooking pasta"), ["gradient"]
        )
        m_second = self.ev.compute_retrieval_metrics(
            hits("cooking pasta", "gradient descent"), ["gradient"]
        )
        assert m_first.mrr == 1.0 and m_second.mrr == 0.5
        assert m_first.ndcg > m_second.ndcg
        assert m_first.precision_at_k == m_second.precision_at_k == 0.5

    def test_no_relevant(self):
        m = self.ev.compute_retrieval_metrics(
            hits("a", "b"), ["nonexistent keyword"]
        )
        assert m.precision_at_k == 0.0
        assert m.hit_rate == 0.0
        assert m.mrr == 0.0

    def test_empty_results(self):
        m = self.ev.compute_retrieval_metrics([], ["x"])
        assert m.num_retrieved == 0

    def test_k_truncation(self):
        results = hits(*(["relevant kw"] * 2 + ["junk"] * 18))
        m = self.ev.compute_retrieval_metrics(results, ["relevant"], k=5)
        assert m.num_retrieved == 5
        assert m.num_relevant == 2


class TestGenerationMetrics:
    def test_unigram_bleu(self):
        ev = RAGEvaluator()
        m = ev.compute_generation_metrics(
            "gradient descent minimizes loss",
            "gradient descent iteratively minimizes the loss",
        )
        assert m.bleu_unigram == 1.0
        m2 = ev.compute_generation_metrics("cats and dogs", "gradient loss")
        assert m2.bleu_unigram == 0.0

    def test_semantic_similarity_with_fake_embedder(self):
        from audio_rag_tpu.embeddings.fake import FakeEmbedder

        ev = RAGEvaluator(embedder=FakeEmbedder())
        m = ev.compute_generation_metrics(
            "gradient descent converges", "gradient descent converges"
        )
        assert m.semantic_similarity == pytest.approx(1.0, abs=1e-4)


class TestDataset:
    def test_builtin_shape(self):
        assert len(CS229_EVAL_DATASET) == 8
        for s in CS229_EVAL_DATASET:
            assert s.question and s.reference_answer
            assert s.relevance_keywords

    def test_json_roundtrip(self, tmp_path):
        p = tmp_path / "d.json"
        CS229_EVAL_DATASET.save(p)
        back = EvalDataset.load(p)
        assert len(back) == 8
        assert back.samples[0].question == \
            CS229_EVAL_DATASET.samples[0].question


class TestDatasetSweep:
    def test_sweep_with_fake_pipeline(self):
        """Ingest the reference answers as the corpus; the evaluator must
        score near-perfect retrieval with the lexical fake embedder."""
        from audio_rag_tpu.config.schema import AudioRAGConfig
        from audio_rag_tpu.core.types import TranscriptSegment
        from audio_rag_tpu.pipeline.orchestrator import AudioRAG

        rag = AudioRAG(AudioRAGConfig(**{
            "asr": {"backend": "fake"},
            "diarization": {"backend": "fake"},
            "embedding": {"backend": "fake"},
            "retrieval": {"backend": "tpu", "capacity_step": 128},
            "reranking": {"backend": "fake"},
            "generation": {"backend": "fake"},
            "chunking": {"min_chunk_tokens": 1, "overlap_tokens": 0},
        }))
        segments = [
            TranscriptSegment(
                text=s.reference_answer, start=float(i * 30),
                end=float(i * 30 + 30), speaker=f"SPEAKER_{i % 2:02d}",
            )
            for i, s in enumerate(CS229_EVAL_DATASET)
        ]
        rag.ingestion.ingest_segments(segments)

        ev = RAGEvaluator(embedder=rag._embedder, k=5)
        results = ev.evaluate_dataset(
            rag, CS229_EVAL_DATASET, search_types=["dense", "hybrid"],
            generate_answers=True,
        )
        assert len(results) == 16
        summary = ev.summarize_results(results)
        assert set(summary) == {"dense", "hybrid"}
        # lexical corpus + lexical embedder: hybrid must find the right chunks
        assert summary["hybrid"]["hit_rate"] >= 0.8
        assert summary["hybrid"]["mrr"] >= 0.5
        assert summary["dense"]["n"] == 8
        report = ev.print_summary(summary)
        assert "precision_at_k" in report


class ScriptedJudge:
    """Deterministic stand-in for the LLM judge: answers by prompt shape."""

    def __init__(self):
        self.calls = []

    def generate(self, prompt, max_tokens=16, temperature=0.0, **kw):
        self.calls.append(prompt)
        if "Rate 0-10" in prompt:
            return " 8 "
        if "Write one short question" in prompt:
            return "what is gradient descent?\n(extra line ignored)"
        if "Is the CONTEXT useful" in prompt:
            ctx = prompt.split("CONTEXT:")[1]
            return "Yes." if "signal" in ctx else "No."
        if "Can the STATEMENT" in prompt:
            stmt = prompt.split("STATEMENT:")[1]
            return "yes" if "gradient" in stmt else "no"
        return "no"


class TestRagasQuartet:
    """First-party equivalents of the reference's ragas metrics
    (reference evaluation/metrics.py:100-126,253-291)."""

    def setup_method(self):
        self.judge = ScriptedJudge()
        self.ev = RAGEvaluator(generator=self.judge)

    def test_faithfulness_parses_rating(self):
        v = self.ev.judge_faithfulness("q", "a", ["ctx"])
        assert v == 0.8

    def test_answer_relevancy_lexical_fallback(self):
        # no embedder → unigram-overlap of regenerated question vs actual
        v = self.ev.judge_answer_relevancy(
            "what is gradient descent?", "gradient descent minimizes loss")
        assert v is not None and v > 0.5
        off = self.ev.judge_answer_relevancy(
            "how do transformers work?", "gradient descent minimizes loss")
        assert off < v

    def test_answer_relevancy_uses_embedder_cosine(self):
        class E:
            def embed(self, texts):
                import numpy as _np
                from audio_rag_tpu.core.types import EmbeddingResult

                out = []
                for t in texts:
                    v = _np.zeros(8, _np.float32)
                    for w in t.lower().split():
                        v[hash(w) % 8] += 1.0
                    out.append(EmbeddingResult(dense=v))
                return out

        ev = RAGEvaluator(generator=self.judge, embedder=E())
        v = ev.judge_answer_relevancy("what is gradient descent?", "a")
        assert 0.0 < v <= 1.0

    def test_context_precision_rank_weighted(self):
        # verdicts [yes, no, yes] → (1/1 + 2/3) / 2
        v = self.ev.judge_context_precision(
            "q", ["signal one", "noise", "signal two"])
        assert v == pytest.approx((1.0 + 2.0 / 3.0) / 2.0, abs=1e-3)
        # useful context ranked lower scores worse than ranked first
        worse = self.ev.judge_context_precision("q", ["noise", "signal"])
        assert worse < v

    def test_context_precision_no_useful(self):
        assert self.ev.judge_context_precision("q", ["noise", "junk"]) == 0.0

    def test_context_recall_statement_fraction(self):
        v = self.ev.judge_context_recall(
            ["ctx"], "gradient descent iterates. pasta is tasty.")
        assert v == 0.5

    def test_quartet_and_summary(self):
        out = self.ev.compute_ragas_metrics(
            "q", "a", ["signal ctx"], "gradient descent iterates.")
        assert set(out) == {"faithfulness", "answer_relevancy",
                            "context_precision", "context_recall"}
        assert all(0.0 <= v <= 1.0 for v in out.values())
        from audio_rag_tpu.evaluation.metrics import (
            EvaluationResult,
            RetrievalMetrics,
        )

        rs = [EvaluationResult("q", "hybrid", RetrievalMetrics(), None,
                               0.01, answer="a", ragas=out)]
        summary = RAGEvaluator.summarize_results(rs)
        assert summary["hybrid"]["faithfulness"] == out["faithfulness"]
        assert "context_recall" in summary["hybrid"]

    def test_no_generator_returns_empty(self):
        assert RAGEvaluator().compute_ragas_metrics("q", "a", ["c"], "g") == {}
