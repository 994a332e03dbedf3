"""Cross-encoder reranker: (query, passage) pairs → relevance scores.

Reference behavior (``reranking/bge.py:51-123`` via sentence-transformers
CrossEncoder over ``BAAI/bge-reranker-base``): XLM-R sequence-classification
head — dense→tanh→out_proj on the CLS state — scoring concatenated
``<s> query </s></s> passage </s>`` pairs, batched.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from audio_rag_tpu.models.bert import BertDims, bert_encode, init_bert
from audio_rag_tpu.models.layers import Params, linear, linear_init

__all__ = ["init_cross_encoder", "cross_encoder_forward", "nli_forward"]


def init_cross_encoder(key: jax.Array, dims: BertDims,
                       n_out: int = 1) -> Params:
    """``n_out=1``: reranker relevance head; ``n_out=3``: NLI
    classification head (contradiction / neutral / entailment — the
    roberta-mnli label order)."""
    k_bert, k_d, k_o = jax.random.split(key, 3)
    return {
        "bert": init_bert(k_bert, dims),
        "dense": linear_init(k_d, dims.d_model, dims.d_model),
        "out": linear_init(k_o, dims.d_model, n_out),
    }


def cross_encoder_forward(
    params: Params,
    dims: BertDims,
    tokens: jax.Array,  # (B, T)
    attention_mask: jax.Array,  # (B, T)
    dtype: jnp.dtype = jnp.bfloat16,
) -> jax.Array:
    """Returns relevance scores (B,) fp32 (pre-sigmoid logits)."""
    h = bert_encode(params["bert"], dims, tokens, attention_mask, dtype)
    cls = h[:, 0, :]
    pooled = jnp.tanh(linear(params["dense"], cls, dtype))
    return linear(params["out"], pooled, dtype)[..., 0].astype(jnp.float32)


def nli_forward(
    params: Params,
    dims: BertDims,
    tokens: jax.Array,  # (B, T)
    attention_mask: jax.Array,  # (B, T)
    dtype: jnp.dtype = jnp.bfloat16,
) -> jax.Array:
    """NLI class logits (B, n_labels) fp32 over ``<s> premise </s></s>
    hypothesis </s>`` pairs — the real-entailment replacement for the
    reranker-sigmoid proxy (reference ``evaluation/metrics.py:132-161``
    uses a cross-encoder NLI model; relevance is NOT entailment)."""
    h = bert_encode(params["bert"], dims, tokens, attention_mask, dtype)
    pooled = jnp.tanh(linear(params["dense"], h[:, 0, :], dtype))
    return linear(params["out"], pooled, dtype).astype(jnp.float32)
