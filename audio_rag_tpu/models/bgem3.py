"""BGE-M3 embedding model: one batched forward → dense + sparse outputs.

Reference behavior to match (``embeddings/bge.py:48-135`` via FlagEmbedding):
* dense vector = L2-normalized first-token (CLS) hidden state, 1024-d;
* sparse lexical weights = ReLU(linear(h_t)) per token, max-pooled per
  token id, special tokens excluded.

Both heads come out of a single TPU forward pass over the XLM-R-large
backbone (:mod:`audio_rag_tpu.models.bert`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from audio_rag_tpu.models.bert import BertDims, bert_encode, init_bert
from audio_rag_tpu.models.layers import Params, linear, linear_init

__all__ = ["init_bgem3", "bgem3_forward"]


def init_bgem3(key: jax.Array, dims: BertDims) -> Params:
    k_bert, k_sparse = jax.random.split(key)
    return {
        "bert": init_bert(k_bert, dims),
        # scalar lexical-weight head (FlagEmbedding's sparse_linear)
        "sparse": linear_init(k_sparse, dims.d_model, 1),
    }


def bgem3_forward(
    params: Params,
    dims: BertDims,
    tokens: jax.Array,  # (B, T)
    attention_mask: jax.Array,  # (B, T) 1 = real
    dtype: jnp.dtype = jnp.bfloat16,
) -> tuple[jax.Array, jax.Array]:
    """Returns (dense (B, d_model) fp32 L2-normalized, token_weights (B, T) fp32).

    ``token_weights`` are ReLU lexical weights per input position (0 at
    padding); the host maps them onto token ids (max over duplicates).
    """
    h = bert_encode(params["bert"], dims, tokens, attention_mask, dtype)
    cls = h[:, 0, :].astype(jnp.float32)
    dense = cls / jnp.maximum(
        jnp.linalg.norm(cls, axis=-1, keepdims=True), 1e-9
    )
    w = jax.nn.relu(linear(params["sparse"], h, dtype)).astype(jnp.float32)
    w = w[..., 0] * attention_mask.astype(jnp.float32)
    return dense, w
