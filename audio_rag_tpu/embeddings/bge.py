"""BGE-M3 embedder backend: dense + sparse from one batched TPU forward.

Parity surface: reference ``embeddings/bge.py:14-157`` (BGEM3FlagModel with
``return_dense=True, return_sparse=True``, batch 32, fp16→bf16, normalized
dense, string-keyed sparse dict → int SparseVector). Here both heads come
from :func:`audio_rag_tpu.models.bgem3.bgem3_forward`; batches pad to
power-of-two length buckets so each bucket compiles once.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from audio_rag_tpu.config.schema import EmbeddingConfig
from audio_rag_tpu.core.base import BaseEmbedder
from audio_rag_tpu.core.types import EmbeddingResult, SparseVector
from audio_rag_tpu.embeddings.base import EmbeddingsRegistry
from audio_rag_tpu.engine.engine import bf16_storage, get_engine
from audio_rag_tpu.models.bert import BERT_PRESETS, BertDims
from audio_rag_tpu.models.bgem3 import bgem3_forward, init_bgem3
from audio_rag_tpu.resources.manager import get_resource_manager
from audio_rag_tpu.text.tokenizer import get_tokenizer, pad_batch
from audio_rag_tpu.utils.decorators import timed

__all__ = ["BGEM3Embedder"]


def _bucket(n: int, lo: int = 16, hi: int = 512) -> int:
    b = lo
    while b < min(n, hi):
        b <<= 1
    return min(b, hi)


@EmbeddingsRegistry.register("bge-m3")
class BGEM3Embedder(BaseEmbedder):
    hbm_required_gb = 2.5

    def __init__(self, config: EmbeddingConfig | None = None):
        super().__init__()
        self.config = config or EmbeddingConfig()
        preset = {"test": "test", "eval-small": "retrieval-small"}.get(
            self.config.model, "xlmr-large")
        self.dims: BertDims = BERT_PRESETS[preset]
        if preset != "xlmr-large":
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

            params = restore_params(self.config.checkpoint_path, "bgem3")
        if params is None and self.config.model == "eval-small":
            # committed contrastively-trained tiny asset
            # (scripts/train_retrieval.py) — the discriminating quality
            # eval's embedder
            from pathlib import Path

            from audio_rag_tpu.checkpoint import load_npz_asset

            params = load_npz_asset(
                Path(__file__).resolve().parents[1] / "assets"
                / "retr_embedder_small.npz")
        if params is None:
            params = init_bgem3(jax.random.PRNGKey(0), self.dims)
        self._params = engine.put_params("bgem3", bf16_storage(params))
        self._tok = get_tokenizer(self.config.checkpoint_path,
                                  vocab_size=self.dims.vocab)
        rm.register_model("embeddings", self.hbm_required_gb, self)

    def _unload(self) -> None:
        if self._engine is not None:
            self._engine.drop_params("bgem3")
        self._params = None
        get_resource_manager().unregister("embeddings")

    def _program(self, B: int, T: int):
        pad_id = self.dims.pad_id

        def build():
            @jax.jit
            def run(params, ids_packed):
                # ids_packed: (B, T) int32 with -1 at padding — one upload
                # carries both ids and mask (host↔device interactions are
                # the latency floor on this runtime)
                mask = (ids_packed >= 0).astype(jnp.int32)
                ids = jnp.where(mask.astype(bool), ids_packed, pad_id)
                dense, w = bgem3_forward(params, self.dims, ids, mask)
                # one packed output → one device→host transfer
                return jnp.concatenate([dense, w], axis=1)

            return run

        return self._engine.program(("bgem3", self.dims, B, T), build)

    @timed
    def embed(self, texts: list[str]) -> list[EmbeddingResult]:
        self.require_loaded()
        get_resource_manager().touch("embeddings")
        if not texts:
            return []
        out: list[EmbeddingResult] = []
        bs = self.config.batch_size
        for i in range(0, len(texts), bs):
            out.extend(self._embed_batch(texts[i: i + bs]))
        return out

    def embed_query(self, query: str) -> EmbeddingResult:
        return self.embed([query])[0]

    def _embed_batch(self, texts: list[str]) -> list[EmbeddingResult]:
        seqs = [
            self._tok.encode(t)[: self.config.max_length] for t in texts
        ]
        T = _bucket(max(len(s) for s in seqs), hi=self.config.max_length)
        B = _bucket(len(seqs), lo=1, hi=self.config.batch_size)
        ids, _ = pad_batch(seqs, T, -1)  # -1 padding doubles as the mask
        if len(seqs) < B:  # pad batch dim to the bucket
            ids = np.pad(ids, ((0, B - len(seqs)), (0, 0)),
                         constant_values=-1)
        run = self._program(B, T)
        packed = np.asarray(run(self._params, jnp.asarray(ids)))
        dense = packed[:, : self.dims.d_model]
        weights = packed[:, self.dims.d_model:]

        results: list[EmbeddingResult] = []
        for j, (text, seq) in enumerate(zip(texts, seqs)):
            sparse = None
            if self.config.use_sparse:
                sparse = self._to_sparse(seq, weights[j])
            vec = dense[j]
            if not self.config.normalize:
                vec = vec.copy()
            results.append(
                EmbeddingResult(dense=vec, sparse=sparse, text=text)
            )
        return results

    def _to_sparse(self, seq: list[int], w: np.ndarray) -> SparseVector:
        """Position weights → per-token-id weights (MAX over duplicate
        occurrences — FlagEmbedding's ``_process_token_weights`` rule),
        special tokens excluded (reference ``embeddings/bge.py:112-135``).
        Emitting one entry per occurrence instead would double-count
        repeated tokens in every lexical match downstream."""
        specials = {self._tok.cls_id, self._tok.sep_id, self._tok.pad_id}
        pooled: dict[int, float] = {}
        for pos, tid in enumerate(seq[: w.shape[0]]):
            if tid in specials or w[pos] <= 0:
                continue
            prev = pooled.get(tid)
            if prev is None or w[pos] > prev:
                pooled[tid] = float(w[pos])
        return SparseVector(list(pooled), list(pooled.values()))
