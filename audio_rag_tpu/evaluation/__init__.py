from audio_rag_tpu.evaluation.dataset import (
    CS229_EVAL_DATASET,
    EvalDataset,
    EvalSample,
)
from audio_rag_tpu.evaluation.metrics import (
    EvaluationResult,
    GenerationMetrics,
    RAGEvaluator,
    RetrievalMetrics,
)

__all__ = [
    "EvalSample",
    "EvalDataset",
    "CS229_EVAL_DATASET",
    "RAGEvaluator",
    "RetrievalMetrics",
    "GenerationMetrics",
    "EvaluationResult",
]
