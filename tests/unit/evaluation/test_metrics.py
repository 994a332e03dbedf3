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
