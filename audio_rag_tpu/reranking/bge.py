"""BGE cross-encoder reranker backend.

Parity surface: reference ``reranking/bge.py:14-147``: rerank the top
``initial_k`` (20) down to ``top_k`` (5); short-circuit when candidates ≤
top_k; replace retrieval scores with cross-encoder scores; degrade
gracefully to the original order if scoring fails. All (query, doc) pairs
score in one batched device call.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from audio_rag_tpu.config.schema import RerankingConfig
from audio_rag_tpu.core.base import BaseReranker
from audio_rag_tpu.core.types import RetrievalResult
from audio_rag_tpu.engine.engine import bf16_storage, get_engine
from audio_rag_tpu.models.bert import BERT_PRESETS, BertDims
from audio_rag_tpu.models.cross_encoder import (
    cross_encoder_forward,
    init_cross_encoder,
)
from audio_rag_tpu.reranking.base import RerankerRegistry
from audio_rag_tpu.resources.manager import get_resource_manager
from audio_rag_tpu.text.tokenizer import get_tokenizer, pad_batch
from audio_rag_tpu.utils.decorators import timed
from audio_rag_tpu.utils.logging import get_logger

log = get_logger(__name__)

__all__ = ["BGEReranker"]


def _bucket(n: int, lo: int, hi: int) -> int:
    b = lo
    while b < min(n, hi):
        b <<= 1
    return min(b, hi)


@RerankerRegistry.register("bge-reranker")
class BGEReranker(BaseReranker):
    hbm_required_gb = 1.2

    def __init__(self, config: RerankingConfig | None = None):
        super().__init__()
        self.config = config or RerankingConfig()
        preset = {"test": "test", "eval-small": "retrieval-small"}.get(
            self.config.model, "xlmr-base")
        self.dims: BertDims = BERT_PRESETS[preset]
        if preset != "xlmr-base":
            self.hbm_required_gb = 0.05
        self._params = None
        self._tok = None

    def _load(self) -> None:
        engine = self._engine or get_engine()
        self._engine = engine
        rm = get_resource_manager()
        rm.ensure_hbm(self.hbm_required_gb, for_model="reranking")
        params = None
        if self.config.checkpoint_path:
            from audio_rag_tpu.checkpoint import restore_params

            params = restore_params(self.config.checkpoint_path, "reranker")
        if params is None and self.config.model == "eval-small":
            # committed pairwise-trained tiny asset
            # (scripts/train_retrieval.py) — the discriminating quality
            # eval's reranker
            from pathlib import Path

            from audio_rag_tpu.checkpoint import load_npz_asset

            params = load_npz_asset(
                Path(__file__).resolve().parents[1] / "assets"
                / "retr_reranker_small.npz")
        if params is None:
            params = init_cross_encoder(jax.random.PRNGKey(0), self.dims)
        self._params = engine.put_params("reranker", bf16_storage(params))
        self._tok = get_tokenizer(self.config.checkpoint_path,
                                  vocab_size=self.dims.vocab)
        rm.register_model("reranking", self.hbm_required_gb, self)

    def _unload(self) -> None:
        if self._engine is not None:
            self._engine.drop_params("reranker")
        self._params = None
        get_resource_manager().unregister("reranking")

    def _program(self, B: int, T: int):
        pad_id = self.dims.pad_id

        def build():
            @jax.jit
            def run(params, ids_packed):
                # -1-padded ids carry the mask; single output transfer
                mask = (ids_packed >= 0).astype(jnp.int32)
                ids = jnp.where(mask.astype(bool), ids_packed, pad_id)
                return cross_encoder_forward(params, self.dims, ids, mask)

            return run

        return self._engine.program(("reranker", self.dims, B, T), build)

    def score_pairs(self, query: str, texts: list[str]) -> np.ndarray:
        """Cross-encoder scores for (query, text) pairs, one device call."""
        max_len = min(self.config.max_length, self.dims.max_len)
        seqs = [self._tok.encode_pair(query, t, max_len) for t in texts]
        T = _bucket(max(len(s) for s in seqs), 16, max_len)
        B = _bucket(len(seqs), 1, max(self.config.initial_k, len(seqs)))
        ids, _ = pad_batch(seqs, T, -1)
        if len(seqs) < B:
            ids = np.pad(ids, ((0, B - len(seqs)), (0, 0)),
                         constant_values=-1)
        run = self._program(B, T)
        scores = np.asarray(run(self._params, jnp.asarray(ids)))
        return scores[: len(seqs)]

    def score_pairs_multi(
        self, queries: list[str], texts: list[str]
    ) -> np.ndarray:
        """Score heterogeneous (query_i, text_i) pairs in one device call
        (used by the batched QueryEngine to amortize dispatch cost)."""
        max_len = min(self.config.max_length, self.dims.max_len)
        seqs = [
            self._tok.encode_pair(q, t, max_len)
            for q, t in zip(queries, texts)
        ]
        T = _bucket(max(len(s) for s in seqs), 16, max_len)
        # small batches: pow-2 buckets (few compile variants); large ones:
        # multiples of 512 — a 2560-pair batch would pad to 4096 (60%
        # wasted MXU work) under pow-2 bucketing
        n = len(seqs)
        B = _bucket(n, 1, 256) if n <= 256 else ((n + 511) // 512) * 512
        ids, _ = pad_batch(seqs, T, -1)
        if len(seqs) < B:
            ids = np.pad(ids, ((0, B - len(seqs)), (0, 0)),
                         constant_values=-1)
        run = self._program(B, T)
        scores = np.asarray(run(self._params, jnp.asarray(ids)))
        return scores[: len(seqs)]

    @timed
    def rerank(
        self, query: str, results: list[RetrievalResult], top_k: int | None = None
    ) -> list[RetrievalResult]:
        self.require_loaded()
        get_resource_manager().touch("reranking")
        k = top_k or self.config.top_k
        if len(results) <= k:
            return results
        try:
            scores = self.score_pairs(query, [r.text for r in results])
        except Exception as exc:
            # graceful degradation (reference reranking/bge.py:125-136)
            log.warning("rerank failed (%s); keeping retrieval order", exc)
            return results[:k]
        order = np.argsort(-scores)[:k]
        out = []
        for i in order:
            r = results[int(i)]
            out.append(
                RetrievalResult(
                    text=r.text, score=float(scores[int(i)]),
                    start=r.start, end=r.end, speaker=r.speaker,
                    chunk_id=r.chunk_id, metadata=r.metadata,
                )
            )
        return out
