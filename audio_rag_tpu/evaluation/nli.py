"""NLI entailment scorer for answer evaluation.

The reference scores entailment with a real NLI cross-encoder (reference
``evaluation/metrics.py:87-90,132-161``); round 1 proxied it by squashing
the RERANKER's relevance score through a sigmoid — but relevance is not
entailment (a fluent contradiction is highly "relevant" to its premise).

This scorer runs a 3-class XLM-R-style classification head
(:func:`audio_rag_tpu.models.cross_encoder.nli_forward`, roberta-mnli
label order [contradiction, neutral, entailment]). Weights resolve in
order: an explicit converted checkpoint (``convert_reranker`` handles any
XLMRobertaForSequenceClassification, including mnli models) → the
committed tiny asset trained by ``scripts/train_nli.py`` (lexical
entailment + negation on the hash tokenizer — enough to order
entailed > neutral > contradicted, which the relevance proxy cannot do)
→ random init (architecture-only).
"""

from __future__ import annotations

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from audio_rag_tpu.models.bert import BERT_PRESETS, BertDims
from audio_rag_tpu.models.cross_encoder import init_cross_encoder, nli_forward
from audio_rag_tpu.text.tokenizer import get_tokenizer, pad_batch
from audio_rag_tpu.utils.logging import get_logger

log = get_logger(__name__)

__all__ = ["NLIScorer", "CONTRADICTION", "NEUTRAL", "ENTAILMENT"]

CONTRADICTION, NEUTRAL, ENTAILMENT = 0, 1, 2

_ASSET = Path(__file__).resolve().parents[1] / "assets" / "nli_small.npz"


def _nest(flat: dict) -> dict:
    tree: dict = {}
    for key, value in flat.items():
        node = tree
        parts = key.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value
    return tree


class NLIScorer:
    """entailment(premise, hypothesis) → P(entailment) in [0, 1]."""

    def __init__(self, model: str = "auto",
                 checkpoint_path: str | None = None,
                 max_length: int = 256):
        self.max_length = max_length
        self._params = None
        self._fn = None
        preset = "xlmr-base"
        if checkpoint_path:
            from audio_rag_tpu.checkpoint import restore_params

            params = restore_params(checkpoint_path, "nli")
            if params is not None:
                self._params = params
        if self._params is None and model in ("auto", "tiny") \
                and _ASSET.exists():
            with np.load(_ASSET) as data:
                self._params = _nest({k: data[k] for k in data.files})
            preset = "nli-small"
        if self._params is None:
            if model != "random":
                # a random-init NLI would emit MEANINGLESS entailment
                # numbers; callers fall back to the relevance proxy instead
                raise FileNotFoundError(
                    "no NLI weights: pass checkpoint_path (convert any "
                    "XLMRobertaForSequenceClassification mnli model via "
                    "convert_reranker) or run scripts/train_nli.py"
                )
            preset = "test"
            self.dims = BERT_PRESETS[preset]
            self._params = init_cross_encoder(
                jax.random.PRNGKey(0), self.dims, n_out=3)
        else:
            self.dims = BERT_PRESETS[preset]
        self._params = jax.tree.map(jnp.asarray, self._params)
        self._tok = get_tokenizer(checkpoint_path,
                                  vocab_size=self.dims.vocab)
        dims = self.dims

        @jax.jit
        def run(params, ids_packed):
            mask = (ids_packed >= 0).astype(jnp.int32)
            ids = jnp.where(mask.astype(bool), ids_packed, dims.pad_id)
            return nli_forward(params, dims, ids, mask,
                               dtype=jnp.float32)

        self._fn = run

    def probs(self, premises: list[str], hypotheses: list[str]) -> np.ndarray:
        """(B, 3) class probabilities [contradiction, neutral, entailment]."""
        max_len = min(self.max_length, self.dims.max_len)
        seqs = [self._tok.encode_pair(p, h, max_len)
                for p, h in zip(premises, hypotheses)]
        T = max(16, 1 << (max(len(s) for s in seqs) - 1).bit_length())
        T = min(T, max_len)
        ids, _ = pad_batch(seqs, T, -1)
        logits = np.asarray(self._fn(self._params, jnp.asarray(ids)))
        e = np.exp(logits - logits.max(axis=-1, keepdims=True))
        return e / e.sum(axis=-1, keepdims=True)

    def entailment(self, premise: str, hypothesis: str) -> float:
        return float(self.probs([premise], [hypothesis])[0, ENTAILMENT])
