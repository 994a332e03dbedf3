"""XLM-RoBERTa-style bidirectional encoder (functional JAX).

Backbone for both the BGE-M3 embedder (reference ``embeddings/bge.py`` uses
FlagEmbedding's XLM-R-large) and the BGE cross-encoder reranker (reference
``reranking/bge.py``). Post-LN blocks, learned positions (offset 2, RoBERTa
convention), GELU FFN. Layers are stacked and scanned.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from audio_rag_tpu.models.layers import (
    Params,
    embedding_init,
    layer_norm,
    layer_norm_init,
    linear,
    mha,
    mha_init,
    mlp_init,
    mlp,
)

__all__ = ["BertDims", "BERT_PRESETS", "init_bert", "bert_encode"]


@dataclasses.dataclass(frozen=True)
class BertDims:
    vocab: int
    d_model: int
    n_heads: int
    n_layers: int
    d_ff: int
    max_len: int
    pad_id: int = 1  # RoBERTa convention
    pos_offset: int = 2


BERT_PRESETS: dict[str, BertDims] = {
    # XLM-R large — BGE-M3 backbone (BAAI/bge-m3)
    "xlmr-large": BertDims(250002, 1024, 16, 24, 4096, 8192),
    # XLM-R base — bge-reranker-base backbone
    "xlmr-base": BertDims(250002, 768, 12, 12, 3072, 512),
    # tiny preset for tests
    "test": BertDims(1024, 64, 2, 2, 128, 128),
    # small preset for the committed trained NLI asset: cross-segment
    # token matching needs more heads/width than "test" provides
    "nli-small": BertDims(4096, 128, 4, 4, 512, 128),
    # small preset for the committed trained retrieval assets (contrastive
    # embedder + pairwise reranker over the synthetic discriminating
    # corpus — evaluation/corpus.py, scripts/train_retrieval.py)
    "retrieval-small": BertDims(4096, 128, 4, 4, 512, 128),
}


def init_bert(key: jax.Array, dims: BertDims) -> Params:
    k_tok, k_pos, k_blocks = jax.random.split(key, 3)
    blocks = []
    for k in jax.random.split(k_blocks, dims.n_layers):
        k_attn, k_mlp = jax.random.split(k)
        blocks.append(
            {
                "attn": mha_init(k_attn, dims.d_model, 1, bias=True,
                                 kv_bias=True),
                "ln_attn": layer_norm_init(dims.d_model),
                "mlp": mlp_init(k_mlp, dims.d_model, dims.d_ff),
                "ln_mlp": layer_norm_init(dims.d_model),
            }
        )
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)
    return {
        "tok_emb": embedding_init(k_tok, dims.vocab, dims.d_model),
        "pos_emb": embedding_init(
            k_pos, dims.max_len + dims.pos_offset, dims.d_model
        ),
        "ln_emb": layer_norm_init(dims.d_model),
        "blocks": stacked,
    }


def bert_encode(
    params: Params,
    dims: BertDims,
    tokens: jax.Array,  # (B, T) int32
    attention_mask: jax.Array | None = None,  # (B, T) bool/int, 1 = real token
    dtype: jnp.dtype = jnp.bfloat16,
) -> jax.Array:
    """Token ids → contextual states (B, T, d_model)."""
    B, T = tokens.shape
    if attention_mask is None:
        attention_mask = (tokens != dims.pad_id).astype(jnp.int32)

    x = params["tok_emb"]["table"].astype(dtype)[tokens]
    # RoBERTa positions: pad tokens keep pad position, real tokens count up
    positions = jnp.cumsum(attention_mask, axis=1) * attention_mask + \
        dims.pos_offset - 1
    x = x + params["pos_emb"]["table"].astype(dtype)[positions]
    x = layer_norm(params["ln_emb"], x)

    # (B, 1, 1, T): attend only to real tokens
    mask = attention_mask[:, None, None, :].astype(bool)

    def block(x, p):
        h, _ = mha(p["attn"], x, dims.n_heads, mask=mask, dtype=dtype)
        x = layer_norm(p["ln_attn"], x + h)  # post-LN
        h = mlp(p["mlp"], x, dtype)
        x = layer_norm(p["ln_mlp"], x + h)
        return x, None

    x, _ = jax.lax.scan(block, x, params["blocks"])
    return x
