"""Fused batched query engine: tokenize → ONE device program for
embed+score+fuse+top-k → ONE batched rerank call.

Rationale (SURVEY.md §3.2): the reference's 141 ms query p50 is the sum of
three separately-served stages (embed 18 ms + Qdrant 48 ms + rerank 38 ms)
plus network hops. On TPU the entire embed→search path is a single XLA
program over a batch of queries, and all (query, candidate) rerank pairs
for the whole batch score in one cross-encoder call — per-query cost is
amortized to ~3 host↔device interactions per *batch*.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from audio_rag_tpu.core.types import RetrievalResult
from audio_rag_tpu.models.bgem3 import bgem3_forward
from audio_rag_tpu.ops.similarity import (
    dense_scores,
    rrf_fuse,
    rrf_prefetch,
    sparse_scores,
    topk_with_mask,
)
from audio_rag_tpu.text.tokenizer import pad_batch
from audio_rag_tpu.utils.decorators import timed

__all__ = ["QueryEngine"]


def _bucket(n: int, lo: int, hi: int) -> int:
    b = lo
    while b < min(n, hi):
        b <<= 1
    return min(b, hi)


class QueryEngine:
    """Batched query service over a loaded BGEM3Embedder + TPUVectorStore
    collection + (optional) BGEReranker."""

    def __init__(self, embedder, store, reranker=None,
                 collection: str | None = None):
        self.embedder = embedder
        self.store = store
        self.reranker = reranker
        self.collection = collection

    def _fused_program(self, B: int, T: int, capacity: int,
                       search_type: str, k: int, rrf_k: float,
                       prefetch: int):
        dims = self.embedder.dims
        engine = self.embedder._engine

        def build():
            @jax.jit
            def run(params, ids_packed, corpus_dense, doc_tokens,
                    doc_weights, valid_mask, corpus_scales=None):
                mask = (ids_packed >= 0).astype(jnp.int32)
                ids = jnp.where(mask.astype(bool), ids_packed, dims.pad_id)
                dense, w = bgem3_forward(params, dims, ids, mask)
                # sparse query terms: token ids with special tokens zeroed
                is_text = mask.astype(bool)
                q_tok = jnp.where(is_text, ids, -1)
                q_w = jnp.where(is_text, w, 0.0)
                # dedup duplicate tokens with max-pooling (FlagEmbedding's
                # lexical-weight semantics; matches the store path): keep
                # the group max at the first occurrence, zero the rest
                Q = q_tok.shape[1]
                same = q_tok[:, :, None] == q_tok[:, None, :]  # (B,Q,Q)
                group_max = jnp.max(
                    jnp.where(same, q_w[:, None, :], 0.0), axis=-1
                )
                pos = jnp.arange(Q)
                first = jnp.min(
                    jnp.where(same, pos[None, None, :], Q), axis=-1
                )
                q_w = jnp.where(first == pos[None, :], group_max, 0.0)
                if search_type == "dense":
                    scores = dense_scores(dense, corpus_dense, corpus_scales)
                elif search_type == "sparse":
                    scores = sparse_scores(q_tok, q_w, doc_tokens,
                                           doc_weights)
                else:
                    d = dense_scores(dense, corpus_dense, corpus_scales)
                    s = sparse_scores(q_tok, q_w, doc_tokens, doc_weights)
                    # rrf_prefetch(true k): Qdrant Prefetch(2·k), bucketed
                    scores = rrf_fuse([d, s], valid_mask, rrf_k=rrf_k,
                                      prefetch=prefetch)
                ts, ti = topk_with_mask(scores, valid_mask, k)
                return jnp.stack([ts, ti.astype(jnp.float32)])

            return run

        key = ("query_fused", B, T, capacity, search_type, k, prefetch)
        return engine.program(key, build)

    @timed
    def query_batch(
        self,
        queries: list[str],
        top_k: int = 5,
        search_type: str = "hybrid",
        initial_k: int = 20,
        rerank: bool = True,
    ) -> list[list[RetrievalResult]]:
        """Run a batch of queries end to end; returns per-query results."""
        from audio_rag_tpu.core.exceptions import RetrievalError

        try:
            coll = self.store._coll(self.collection)
        except RetrievalError:
            return [[] for _ in queries]
        if coll.count == 0:
            return [[] for _ in queries]
        dev = coll.device_arrays()
        tok = self.embedder._tok

        seqs = [tok.encode(q)[:64] for q in queries]
        T = _bucket(max(len(s) for s in seqs), 16, 64)
        B = _bucket(len(seqs), 1, 256)
        ids, _ = pad_batch(seqs, T, -1)
        if len(seqs) < B:
            ids = np.pad(ids, ((0, B - len(seqs)), (0, 0)),
                         constant_values=-1)

        fetch_k = initial_k if (rerank and self.reranker) else top_k
        fetch_k = min(fetch_k, coll.count)
        # pow-2-bucket the program's k (it is static and shapes the output):
        # raw fetch_k tracks a growing corpus count and the API's top_k,
        # each distinct value a fresh remote compile otherwise
        k_run = min(1 << (max(fetch_k, 1) - 1).bit_length(), coll.capacity)
        run = self._fused_program(
            B, T, coll.capacity, search_type, k_run,
            float(self.store.config.rrf_k), rrf_prefetch(fetch_k),
        )
        packed = np.asarray(run(
            self.embedder._params, jnp.asarray(ids), dev["dense"],
            dev["doc_tokens"], dev["doc_weights"], dev["valid_mask"],
            dev.get("scales"),
        ))
        scores = packed[0][: len(queries), :fetch_k]
        idx = packed[1][: len(queries), :fetch_k].astype(np.int64)

        candidates: list[list[RetrievalResult]] = []
        for qi in range(len(queries)):
            row: list[RetrievalResult] = []
            for s, i in zip(scores[qi], idx[qi]):
                if s <= -1e29:
                    continue
                p = coll.payloads[int(i)]
                row.append(RetrievalResult(
                    text=p["text"], score=float(s), start=p["start"],
                    end=p["end"], speaker=p["speaker"], chunk_id=p["id"],
                    metadata=p["metadata"],
                ))
            candidates.append(row)

        if not (rerank and self.reranker):
            return [row[:top_k] for row in candidates]

        # batched rerank: ALL (query, candidate) pairs in one device call
        flat_queries: list[str] = []
        flat_texts: list[str] = []
        spans: list[tuple[int, int]] = []
        for q, row in zip(queries, candidates):
            start = len(flat_texts)
            flat_queries.extend([q] * len(row))
            flat_texts.extend(r.text for r in row)
            spans.append((start, len(flat_texts)))
        if not flat_texts:
            return candidates
        pair_scores = self.reranker.score_pairs_multi(
            flat_queries, flat_texts
        )
        out: list[list[RetrievalResult]] = []
        for (a, b), row in zip(spans, candidates):
            ss = pair_scores[a:b]
            order = np.argsort(-ss)[:top_k]
            out.append([
                RetrievalResult(
                    text=row[i].text, score=float(ss[i]),
                    start=row[i].start, end=row[i].end,
                    speaker=row[i].speaker, chunk_id=row[i].chunk_id,
                    metadata=row[i].metadata,
                )
                for i in order
            ])
        return out
