"""Generate the committed fidelity goldens under tests/goldens/.

Two artifacts:

1. ``tiny_tokenizer/`` — a REAL HuggingFace fast tokenizer (BPE trained on
   the lecture corpus below, XLM-R special-token layout: <s>=0 <pad>=1
   </s>=2 <unk>=3) so sparse lexical ids and cross-encoder pair encoding
   exercise genuine subword behavior instead of the hash-word fallback —
   the regime where hybrid-RRF ties and prefix/truncation rules actually
   bite (reference ``embeddings/bge.py:112-135``).
2. ``rankings.json`` — end-to-end ingest→query ranking goldens: the tiny
   embedder/reranker (deterministic PRNGKey(0) init) + the real tokenizer
   over a fixed lecture corpus, queried with the built-in eval questions.
   tests/integration/test_ranking_goldens.py replays this file verbatim;
   any drift in tokenizer semantics, sparse extraction, RRF fusion, or the
   fused rerank program shows up as a diff.

Run on CPU for cross-environment determinism:
    python scripts/make_goldens.py
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
GOLDENS = REPO / "tests" / "goldens"

# a fixed miniature lecture corpus (authored here; thematically parallel to
# the reference's CS229 eval set so the eval questions have real answers)
CORPUS = [
    "gradient descent updates the parameters by stepping along the negative "
    "gradient of the loss function",
    "the learning rate controls the step size of gradient descent and a "
    "rate that is too large can diverge",
    "a learning rate that is too small makes gradient descent converge "
    "very slowly toward the minimum",
    "regularization adds a penalty on large weights which reduces "
    "overfitting and improves generalization",
    "l2 regularization shrinks the weights smoothly while l1 "
    "regularization drives some weights exactly to zero",
    "overfitting happens when the model memorizes training data and fails "
    "to generalize to new examples",
    "supervised learning fits labeled input output pairs while "
    "unsupervised learning finds structure in unlabeled data",
    "clustering is a classic unsupervised learning method that groups "
    "similar examples without labels",
    "the validation set is used to tune hyperparameters and the test set "
    "gives the final unbiased estimate",
    "tuning hyperparameters on the test set leaks information and inflates "
    "the reported accuracy",
    "the kernel trick computes inner products in a high dimensional "
    "feature space without explicit mapping",
    "support vector machines with a kernel can fit nonlinear decision "
    "boundaries using linear methods",
    "backpropagation applies the chain rule layer by layer from the loss "
    "backwards through the network",
    "backpropagation reuses intermediate activations so all parameter "
    "gradients are computed efficiently",
    "simple models underfit with high bias while complex models overfit "
    "with high variance",
    "the bias variance tradeoff says generalization error is minimized by "
    "balancing model complexity",
    "logistic regression models class probabilities with a sigmoid and is "
    "used for classification",
    "linear regression predicts continuous targets by minimizing squared "
    "error on the training data",
    "stochastic gradient descent uses minibatches which adds noise but "
    "scales to large datasets",
    "early stopping halts training when validation error rises which acts "
    "like implicit regularization",
    "feature scaling such as standardization speeds up convergence of "
    "gradient based optimizers",
    "cross validation averages performance over folds to get a more "
    "reliable estimate of generalization",
    "the softmax function generalizes the sigmoid to multiclass "
    "classification problems",
    "momentum accumulates past gradients to damp oscillations and "
    "accelerate gradient descent",
]


def build_tokenizer(out_dir: Path) -> None:
    from tokenizers import Tokenizer, decoders, models, pre_tokenizers, trainers
    from tokenizers.processors import TemplateProcessing
    from transformers import PreTrainedTokenizerFast

    tok = Tokenizer(models.BPE(unk_token="<unk>"))
    tok.pre_tokenizer = pre_tokenizers.Whitespace()
    tok.decoder = decoders.BPEDecoder()
    trainer = trainers.BpeTrainer(
        vocab_size=800,
        special_tokens=["<s>", "<pad>", "</s>", "<unk>"],  # XLM-R layout
        min_frequency=1,
        show_progress=False,
    )
    tok.train_from_iterator(CORPUS, trainer)
    tok.post_processor = TemplateProcessing(
        single="<s> $A </s>",
        pair="<s> $A </s> </s> $B:1 </s>:1",
        special_tokens=[("<s>", 0), ("</s>", 2)],
    )
    fast = PreTrainedTokenizerFast(
        tokenizer_object=tok,
        bos_token="<s>", eos_token="</s>", cls_token="<s>",
        sep_token="</s>", pad_token="<pad>", unk_token="<unk>",
        model_max_length=512,
    )
    out_dir.mkdir(parents=True, exist_ok=True)
    fast.save_pretrained(out_dir)
    print(f"tokenizer: vocab {fast.vocab_size} -> {out_dir}")


def build_rankings(tok_dir: Path, out_file: Path) -> None:
    import os

    # mirror tests/conftest.py exactly: the goldens are replayed on the
    # 8-device virtual CPU mesh, and sharded-matmul reduction order moves
    # rerank scores by one bf16 ulp vs a single-device run
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")  # determinism across envs
    import numpy as np  # noqa: F401

    from audio_rag_tpu.config.schema import (
        EmbeddingConfig,
        RerankingConfig,
        RetrievalConfig,
    )
    from audio_rag_tpu.core.types import AudioChunk
    from audio_rag_tpu.embeddings.bge import BGEM3Embedder
    from audio_rag_tpu.engine.query_engine import QueryEngine
    from audio_rag_tpu.evaluation.dataset import CS229_EVAL_DATASET
    from audio_rag_tpu.reranking.bge import BGEReranker
    from audio_rag_tpu.retrieval.tpu_store import TPUVectorStore

    emb = BGEM3Embedder(EmbeddingConfig(
        model="test", checkpoint_path=str(tok_dir),
    ))
    emb.load()
    rr = BGEReranker(RerankingConfig(
        model="test", checkpoint_path=str(tok_dir), fused_doc_tokens=64,
    ))
    rr.load()
    store = TPUVectorStore(RetrievalConfig(capacity_step=128))
    chunks = [
        AudioChunk(t, float(i) * 30.0, float(i + 1) * 30.0,
                   speaker=f"SPEAKER_{i % 2:02d}", chunk_id=f"g{i:02d}")
        for i, t in enumerate(CORPUS)
    ]
    store.add(chunks, emb.embed(CORPUS))
    engine = QueryEngine(emb, store, rr)

    queries = [s.question for s in CS229_EVAL_DATASET]
    golden: dict = {"corpus": CORPUS, "queries": queries, "runs": {}}
    for stype in ("dense", "hybrid"):
        for rerank in (False, True):
            rows = engine.query_batch(
                queries, top_k=5, search_type=stype, rerank=rerank,
            )
            golden["runs"][f"{stype}_rerank{int(rerank)}"] = [
                {
                    "ids": [r.chunk_id for r in row],
                    "scores": [round(float(r.score), 4) for r in row],
                }
                for row in rows
            ]
    out_file.write_text(json.dumps(golden, indent=1))
    print(f"rankings: {len(queries)} queries x 4 runs -> {out_file}")


def main() -> None:
    tok_dir = GOLDENS / "tiny_tokenizer"
    build_tokenizer(tok_dir)
    build_rankings(tok_dir, GOLDENS / "rankings.json")


if __name__ == "__main__":
    sys.exit(main())
