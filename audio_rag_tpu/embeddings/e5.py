"""Multilingual-E5 embedder backend.

The reference's config schema allows ``multilingual-e5``
(``config/schema.py:50``) but ships no implementation (SURVEY.md §2.2);
this closes that gap. Same XLM-R backbone as BGE-M3 with E5's conventions:
"query: "/"passage: " prefixes, mean pooling over real tokens, L2
normalization, dense-only.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from audio_rag_tpu.config.schema import EmbeddingConfig
from audio_rag_tpu.core.base import BaseEmbedder
from audio_rag_tpu.core.types import EmbeddingResult
from audio_rag_tpu.embeddings.base import EmbeddingsRegistry
from audio_rag_tpu.engine.engine import bf16_storage, get_engine
from audio_rag_tpu.models.bert import BERT_PRESETS, BertDims, bert_encode, init_bert
from audio_rag_tpu.resources.manager import get_resource_manager
from audio_rag_tpu.text.tokenizer import get_tokenizer, pad_batch
from audio_rag_tpu.utils.decorators import timed

__all__ = ["E5Embedder"]


def _bucket(n: int, lo: int, hi: int) -> int:
    b = lo
    while b < min(n, hi):
        b <<= 1
    return min(b, hi)


@EmbeddingsRegistry.register("multilingual-e5")
class E5Embedder(BaseEmbedder):
    hbm_required_gb = 2.3

    def __init__(self, config: EmbeddingConfig | None = None):
        super().__init__()
        self.config = config or EmbeddingConfig()
        preset = "test" if self.config.model == "test" else "xlmr-large"
        self.dims: BertDims = BERT_PRESETS[preset]
        if preset == "test":
            self.hbm_required_gb = 0.05
        self._params = None
        self._tok = None

    def _load(self) -> None:
        engine = self._engine or get_engine()
        self._engine = engine
        rm = get_resource_manager()
        rm.ensure_hbm(self.hbm_required_gb, for_model="embeddings")
        params = None
        if self.config.checkpoint_path:
            from audio_rag_tpu.checkpoint import restore_params

            params = restore_params(self.config.checkpoint_path, "e5")
        if params is None:
            params = init_bert(jax.random.PRNGKey(0), self.dims)
        self._params = engine.put_params("e5", bf16_storage(params))
        self._tok = get_tokenizer(self.config.checkpoint_path,
                                  vocab_size=self.dims.vocab)
        rm.register_model("embeddings", self.hbm_required_gb, self)

    def _unload(self) -> None:
        if self._engine is not None:
            self._engine.drop_params("e5")
        self._params = None
        get_resource_manager().unregister("embeddings")

    def _program(self, B: int, T: int):
        pad_id = self.dims.pad_id

        def build():
            @jax.jit
            def run(params, ids_packed):
                mask = (ids_packed >= 0).astype(jnp.int32)
                ids = jnp.where(mask.astype(bool), ids_packed, pad_id)
                h = bert_encode(params, self.dims, ids, mask)
                m = mask.astype(jnp.float32)[..., None]
                pooled = jnp.sum(h.astype(jnp.float32) * m, axis=1) / \
                    jnp.maximum(jnp.sum(m, axis=1), 1e-9)
                return pooled / jnp.maximum(
                    jnp.linalg.norm(pooled, axis=-1, keepdims=True), 1e-9
                )

            return run

        return self._engine.program(("e5", self.dims, B, T), build)

    def _embed_prefixed(self, texts: list[str]) -> list[EmbeddingResult]:
        seqs = [self._tok.encode(t)[: self.config.max_length] for t in texts]
        T = _bucket(max(len(s) for s in seqs), 16, self.config.max_length)
        B = _bucket(len(seqs), 1, self.config.batch_size)
        ids, _ = pad_batch(seqs, T, -1)
        if len(seqs) < B:
            ids = np.pad(ids, ((0, B - len(seqs)), (0, 0)),
                         constant_values=-1)
        dense = np.asarray(self._program(B, T)(
            self._params, jnp.asarray(ids)
        ))
        return [
            EmbeddingResult(dense=dense[i], sparse=None, text=t)
            for i, t in enumerate(texts)
        ]

    @timed
    def embed(self, texts: list[str]) -> list[EmbeddingResult]:
        self.require_loaded()
        if not texts:
            return []
        out: list[EmbeddingResult] = []
        bs = self.config.batch_size
        prefixed = [f"passage: {t}" for t in texts]
        for i in range(0, len(prefixed), bs):
            out.extend(self._embed_prefixed(prefixed[i: i + bs]))
        for r, original in zip(out, texts):
            r.text = original
        return out

    def embed_query(self, query: str) -> EmbeddingResult:
        self.require_loaded()
        r = self._embed_prefixed([f"query: {query}"])[0]
        r.text = query
        return r
