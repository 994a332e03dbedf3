"""RAG evaluation harness.

Parity surface: reference ``evaluation/metrics.py:14-451``:
* retrieval metrics with keyword-substring relevance: precision@k,
  recall@k, MRR, NDCG, hit rate (``metrics.py:163-218``);
* generation metrics: semantic similarity (embedder cosine), entailment
  score (cross-encoder when available), unigram-overlap BLEU
  (``metrics.py:220-251``);
* optional LLM-judged faithfulness/relevancy (the reference's RAGAS-over-
  Ollama, ``metrics.py:253-291``, served by the on-mesh generator);
* dataset sweep across search types with avg + p95 latency summary and a
  printable report (``metrics.py:340-451``).
"""

from __future__ import annotations

import math
import re
import time
from dataclasses import asdict, dataclass
from typing import Any

import numpy as np

from audio_rag_tpu.evaluation.dataset import EvalDataset, EvalSample
from audio_rag_tpu.utils.logging import get_logger

log = get_logger(__name__)

__all__ = [
    "RetrievalMetrics",
    "GenerationMetrics",
    "EvaluationResult",
    "RAGEvaluator",
]


@dataclass
class RetrievalMetrics:
    precision_at_k: float = 0.0
    recall_at_k: float = 0.0
    mrr: float = 0.0
    ndcg: float = 0.0
    hit_rate: float = 0.0
    num_retrieved: int = 0
    num_relevant: int = 0


@dataclass
class GenerationMetrics:
    semantic_similarity: float | None = None
    entailment_score: float | None = None
    bleu_unigram: float = 0.0
    answer_length: int = 0


@dataclass
class EvaluationResult:
    question: str
    search_type: str
    retrieval: RetrievalMetrics
    generation: GenerationMetrics | None
    latency_s: float
    answer: str | None = None

    def to_dict(self) -> dict[str, Any]:
        return {
            "question": self.question,
            "search_type": self.search_type,
            "retrieval": asdict(self.retrieval),
            "generation": asdict(self.generation)
            if self.generation else None,
            "latency_s": self.latency_s,
        }


def _is_relevant(text: str, keywords: list[str]) -> bool:
    """Keyword-substring relevance (reference metrics.py:163-176)."""
    low = text.lower()
    return any(k.lower() in low for k in keywords)


class RAGEvaluator:
    def __init__(self, embedder=None, reranker=None, generator=None,
                 k: int = 5, nli=None):
        #: embedder for semantic similarity (optional)
        self.embedder = embedder
        #: cross-encoder relevance scoring — LAST-RESORT entailment proxy
        self.reranker = reranker
        #: LLM judge for faithfulness (optional)
        self.generator = generator
        #: real NLI scorer (evaluation/nli.py); built lazily when None
        self._nli = nli
        self._nli_tried = nli is not None
        self.k = k

    @property
    def nli(self):
        if not self._nli_tried:
            self._nli_tried = True
            try:
                from audio_rag_tpu.evaluation.nli import NLIScorer

                self._nli = NLIScorer()
            except Exception as exc:
                log.warning("NLI scorer unavailable: %s", exc)
        return self._nli

    # -- retrieval ---------------------------------------------------------
    def compute_retrieval_metrics(
        self, results: list, keywords: list[str], k: int | None = None
    ) -> RetrievalMetrics:
        k = k or self.k
        top = results[:k]
        if not top or not keywords:
            return RetrievalMetrics(num_retrieved=len(top))
        rel = [_is_relevant(r.text, keywords) for r in top]
        n_rel = sum(rel)
        precision = n_rel / len(top)
        # recall denominator: relevant among all retrieved (reference
        # semantics — no ground-truth corpus labels exist)
        all_rel = sum(
            1 for r in results if _is_relevant(r.text, keywords)
        )
        recall = n_rel / all_rel if all_rel else 0.0
        mrr = 0.0
        for i, flag in enumerate(rel):
            if flag:
                mrr = 1.0 / (i + 1)
                break
        dcg = sum(
            (1.0 if flag else 0.0) / math.log2(i + 2)
            for i, flag in enumerate(rel)
        )
        ideal = sum(1.0 / math.log2(i + 2) for i in range(n_rel))
        ndcg = dcg / ideal if ideal else 0.0
        return RetrievalMetrics(
            precision_at_k=round(precision, 4),
            recall_at_k=round(recall, 4),
            mrr=round(mrr, 4),
            ndcg=round(ndcg, 4),
            hit_rate=1.0 if n_rel else 0.0,
            num_retrieved=len(top),
            num_relevant=n_rel,
        )

    # -- generation --------------------------------------------------------
    @staticmethod
    def _unigram_bleu(candidate: str, reference: str) -> float:
        """Clipped unigram precision (reference metrics.py:240-251)."""
        cand = re.findall(r"[a-z0-9']+", candidate.lower())
        ref = re.findall(r"[a-z0-9']+", reference.lower())
        if not cand:
            return 0.0
        ref_counts: dict[str, int] = {}
        for w in ref:
            ref_counts[w] = ref_counts.get(w, 0) + 1
        clipped = 0
        for w in cand:
            if ref_counts.get(w, 0) > 0:
                clipped += 1
                ref_counts[w] -= 1
        return round(clipped / len(cand), 4)

    def compute_generation_metrics(
        self, answer: str, reference: str
    ) -> GenerationMetrics:
        m = GenerationMetrics(
            bleu_unigram=self._unigram_bleu(answer, reference),
            answer_length=len(answer.split()),
        )
        if self.embedder is not None:
            try:
                a, b = self.embedder.embed([answer, reference])
                m.semantic_similarity = round(
                    float(np.dot(a.dense, b.dense)
                          / max(np.linalg.norm(a.dense)
                                * np.linalg.norm(b.dense), 1e-9)), 4
                )
            except Exception as exc:
                log.warning("semantic similarity failed: %s", exc)
        # real NLI (reference evaluation/metrics.py:132-161): P(entailment)
        # from a 3-class cross-encoder — relevance is NOT entailment, so
        # the reranker-sigmoid proxy only applies when no NLI model loads
        if self.nli is not None:
            try:
                m.entailment_score = round(
                    self.nli.entailment(reference, answer), 4)
                return m
            except Exception as exc:
                log.warning("NLI entailment failed: %s", exc)
        if self.reranker is not None and hasattr(self.reranker,
                                                "score_pairs"):
            try:
                score = float(
                    self.reranker.score_pairs(reference, [answer])[0]
                )
                m.entailment_score = round(1.0 / (1.0 + math.exp(-score)), 4)
            except Exception as exc:
                log.warning("entailment scoring failed: %s", exc)
        return m

    # -- LLM-judged faithfulness (RAGAS-style) -----------------------------
    def judge_faithfulness(
        self, question: str, answer: str, contexts: list[str]
    ) -> float | None:
        """Ask the generator whether the answer is grounded in the contexts
        (0-10 → 0-1). Replaces the reference's RAGAS-over-Ollama."""
        if self.generator is None:
            return None
        ctx = "\n---\n".join(c[:500] for c in contexts[:5])
        prompt = (
            "Rate 0-10 how well the ANSWER is supported by the CONTEXTS. "
            "Reply with a single number.\n\n"
            f"QUESTION: {question}\nANSWER: {answer}\nCONTEXTS:\n{ctx}\n\n"
            "Rating:"
        )
        try:
            raw = self.generator.generate(prompt, max_tokens=4,
                                          temperature=0.0)
            m = re.search(r"\d+(\.\d+)?", raw)
            return min(float(m.group()) / 10.0, 1.0) if m else None
        except Exception as exc:
            log.warning("faithfulness judge failed: %s", exc)
            return None

    # -- dataset sweep -----------------------------------------------------
    def evaluate_dataset(
        self,
        pipeline,
        dataset: EvalDataset,
        search_types: list[str] = ("dense", "hybrid"),
        generate_answers: bool = False,
        use_hyde: bool = False,
    ) -> list[EvaluationResult]:
        results: list[EvaluationResult] = []
        for search_type in search_types:
            for sample in dataset:
                results.append(
                    self._evaluate_sample(
                        pipeline, sample, search_type,
                        generate_answers, use_hyde,
                    )
                )
        return results

    def _evaluate_sample(
        self, pipeline, sample: EvalSample, search_type: str,
        generate_answers: bool, use_hyde: bool,
    ) -> EvaluationResult:
        t0 = time.perf_counter()
        out = pipeline.query(
            sample.question,
            search_type=search_type,
            top_k=self.k,
            use_hyde=use_hyde,
            generate_answer=generate_answers,
        )
        latency = time.perf_counter() - t0
        retrieval = self.compute_retrieval_metrics(
            out.results, sample.relevance_keywords
        )
        generation = None
        if generate_answers and out.answer:
            generation = self.compute_generation_metrics(
                out.answer, sample.reference_answer
            )
        return EvaluationResult(
            question=sample.question,
            search_type=search_type,
            retrieval=retrieval,
            generation=generation,
            latency_s=round(latency, 4),
            answer=out.answer,
        )

    # -- summary -----------------------------------------------------------
    @staticmethod
    def summarize_results(
        results: list[EvaluationResult],
    ) -> dict[str, dict[str, float]]:
        """Per-search-type averages + latency percentiles
        (reference metrics.py:394-428)."""
        by_type: dict[str, list[EvaluationResult]] = {}
        for r in results:
            by_type.setdefault(r.search_type, []).append(r)
        summary: dict[str, dict[str, float]] = {}
        for stype, rs in by_type.items():
            lat = np.array([r.latency_s for r in rs])
            entry = {
                "precision_at_k": float(np.mean(
                    [r.retrieval.precision_at_k for r in rs])),
                "recall_at_k": float(np.mean(
                    [r.retrieval.recall_at_k for r in rs])),
                "mrr": float(np.mean([r.retrieval.mrr for r in rs])),
                "ndcg": float(np.mean([r.retrieval.ndcg for r in rs])),
                "hit_rate": float(np.mean(
                    [r.retrieval.hit_rate for r in rs])),
                "avg_latency_s": float(lat.mean()),
                "p95_latency_s": float(np.percentile(lat, 95)),
                "n": len(rs),
            }
            gens = [r.generation for r in rs if r.generation]
            if gens:
                entry["bleu_unigram"] = float(np.mean(
                    [g.bleu_unigram for g in gens]))
                sims = [g.semantic_similarity for g in gens
                        if g.semantic_similarity is not None]
                if sims:
                    entry["semantic_similarity"] = float(np.mean(sims))
            summary[stype] = {k: round(v, 4) for k, v in entry.items()}
        return summary

    @staticmethod
    def print_summary(summary: dict[str, dict[str, float]]) -> str:
        lines = [f"{'':<12}" + "".join(
            f"{s:>12}" for s in summary
        )]
        metrics = sorted(
            {m for v in summary.values() for m in v}
        )
        for m in metrics:
            lines.append(
                f"{m:<20}" + "".join(
                    f"{summary[s].get(m, float('nan')):>12.4f}"
                    for s in summary
                )
            )
        report = "\n".join(lines)
        print(report)
        return report
