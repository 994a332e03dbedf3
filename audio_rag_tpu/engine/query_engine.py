"""Fused batched query engine: tokenize → ONE device program for
embed+score+fuse+top-k+rerank.

Rationale (SURVEY.md §3.2): the reference's 141 ms query p50 is the sum of
three separately-served stages (embed 18 ms + Qdrant 48 ms + rerank 38 ms)
plus network hops. On TPU the entire embed→search→rerank path is a single
XLA program: the corpus keeps a device-resident cache of each chunk's
reranker tokens, so after the in-program top-k the cross-encoder gathers
its candidate passages ON DEVICE and re-ranks them without ever returning
to the host. One dispatch, one readback — which matters doubly on this
runtime, where every host↔device interaction carries a flat ~28 ms cost
(two programs put a ≥56 ms floor under single-query latency; one program
makes the <50 ms p50 target reachable).
"""

from __future__ import annotations

import threading

import jax
import jax.numpy as jnp
import numpy as np

from audio_rag_tpu.core.types import RetrievalResult
from audio_rag_tpu.models.bgem3 import bgem3_forward
from audio_rag_tpu.ops.similarity import (
    NEG_INF,
    dense_scores,
    rrf_fuse,
    rrf_prefetch,
    sparse_scores,
    topk_with_mask,
)
from audio_rag_tpu.text.tokenizer import pad_batch
from audio_rag_tpu.utils.decorators import timed
from audio_rag_tpu.utils.logging import get_logger

log = get_logger(__name__)

__all__ = ["QueryEngine"]


#: max rerank pairs alive in one cross-encoder scan step — bounds the
#: (chunk, H, T, T) attention working set (~800 MB at 256×12×256×256 fp32)
_PAIR_CHUNK = 256


def _bucket(n: int, lo: int, hi: int) -> int:
    b = lo
    while b < min(n, hi):
        b <<= 1
    return min(b, hi)


def _embed_and_score(params, dims, ids_packed, corpus_dense, doc_tokens,
                     doc_weights, valid_mask, corpus_scales,
                     search_type: str, rrf_k: float, prefetch: int):
    """Shared trace: query embed (dense+sparse) → corpus scores (B, N)."""
    mask = (ids_packed >= 0).astype(jnp.int32)
    ids = jnp.where(mask.astype(bool), ids_packed, dims.pad_id)
    dense, w = bgem3_forward(params, dims, ids, mask)
    # sparse query terms: token ids with special tokens zeroed; duplicate
    # tokens max-pool inside sparse_scores (FlagEmbedding's lexical-weight
    # rule, same semantics as the store path)
    is_text = mask.astype(bool)
    q_tok = jnp.where(is_text, ids, -1)
    q_w = jnp.where(is_text, w, 0.0)
    if search_type == "dense":
        return dense_scores(dense, corpus_dense, corpus_scales)
    if search_type == "sparse":
        return sparse_scores(q_tok, q_w, doc_tokens, doc_weights)
    d = dense_scores(dense, corpus_dense, corpus_scales)
    s = sparse_scores(q_tok, q_w, doc_tokens, doc_weights)
    # rrf_prefetch(true k): Qdrant Prefetch(2·k), pow-2 bucketed
    # sparse membership floor 0.0: a no-overlap doc is absent from a
    # Qdrant sparse result list and must add no rank mass (similarity.py)
    return rrf_fuse([d, s], valid_mask, rrf_k=rrf_k, prefetch=prefetch,
                    min_scores=(None, 0.0))


class QueryEngine:
    """Batched query service over a loaded BGEM3Embedder + TPUVectorStore
    collection + (optional) BGEReranker."""

    def __init__(self, embedder, store, reranker=None,
                 collection: str | None = None):
        self.embedder = embedder
        self.store = store
        self.reranker = reranker
        self.collection = collection
        # per-collection device cache of reranker doc tokens: name →
        # (coll_uid, count, host (capacity, Ld) i32, device array, max_len)
        self._rr_cache: dict[
            str, tuple[str, int, np.ndarray, jax.Array, int]
        ] = {}
        self._rr_lock = threading.Lock()

    # -- programs -----------------------------------------------------------
    def _fused_program(self, B: int, T: int, capacity: int,
                       search_type: str, k: int, rrf_k: float,
                       prefetch: int):
        dims = self.embedder.dims
        engine = self.embedder._engine

        def build():
            @jax.jit
            def run(params, ids_packed, corpus_dense, doc_tokens,
                    doc_weights, valid_mask, corpus_scales=None):
                scores = _embed_and_score(
                    params, dims, ids_packed, corpus_dense, doc_tokens,
                    doc_weights, valid_mask, corpus_scales, search_type,
                    rrf_k, prefetch,
                )
                ts, ti = topk_with_mask(scores, valid_mask, k)
                return jnp.stack([ts, ti.astype(jnp.float32)])

            return run

        key = ("query_fused", dims, B, T, capacity, search_type, k, prefetch)
        return engine.program(key, build)

    def _fused_rerank_program(self, B: int, T: int, Pq: int, capacity: int,
                              Ld: int, search_type: str, K: int, k_out: int,
                              rrf_k: float, prefetch: int):
        """ONE program: embed → score → top-K candidates → gather their
        cached reranker tokens → cross-encoder → final top-k.

        ``n_cand`` arrives as a DYNAMIC scalar (candidates beyond it are
        masked out of the rerank pool) so the reference's "rerank exactly
        initial_k candidates" semantics hold without a fresh compile per
        corpus count. Output is one packed (2, B, k_out) array: row 0 =
        cross-encoder scores, row 1 = corpus indices.

        The B·K rerank pairs run through the cross-encoder as a lax.scan
        over ≤``_PAIR_CHUNK``-row chunks: full-batch attention would
        materialize (B·K, H, T, T) fp32 logits — 10+ GB at B=128 — while
        chunking caps the live working set with no FLOP change.
        """
        from audio_rag_tpu.models.cross_encoder import cross_encoder_forward

        e_dims = self.embedder.dims
        r_dims = self.reranker.dims
        engine = self.embedder._engine
        n_pairs = B * K
        chunk = n_pairs
        while chunk > _PAIR_CHUNK or n_pairs % chunk:
            chunk -= 1

        def build():
            @jax.jit
            def run(params_e, params_r, ids_embed, ids_rq, n_cand,
                    corpus_dense, doc_tokens, doc_weights, valid_mask,
                    rr_docs, corpus_scales=None):
                scores = _embed_and_score(
                    params_e, e_dims, ids_embed, corpus_dense, doc_tokens,
                    doc_weights, valid_mask, corpus_scales, search_type,
                    rrf_k, prefetch,
                )
                cs, ci = topk_with_mask(scores, valid_mask, K)  # (B, K)
                # candidate passages: gather cached reranker token rows,
                # sliced to the collection's bucketed max passage length
                docs = rr_docs[:, :Ld][ci]  # (B, K, Ld)
                qp = jnp.broadcast_to(ids_rq[:, None, :], (B, K, Pq))
                pair = jnp.concatenate([qp, docs], axis=-1)
                # -1 padding carries the mask; internal holes between the
                # query prefix and the doc tokens are position-exact for
                # XLM-R (positions = cumsum of the attention mask)
                pair = pair.reshape(n_pairs // chunk, chunk, Pq + Ld)

                def step(_, rows):
                    mask = (rows >= 0).astype(jnp.int32)
                    ids2 = jnp.where(mask.astype(bool), rows, r_dims.pad_id)
                    return None, cross_encoder_forward(
                        params_r, r_dims, ids2, mask
                    )

                _, logits = jax.lax.scan(step, None, pair)
                logits = logits.reshape(B, K)
                in_pool = (jnp.arange(K)[None, :] < n_cand) & (
                    cs > NEG_INF / 2
                )
                logits = jnp.where(in_pool, logits, NEG_INF)
                fs, fi = jax.lax.top_k(logits, k_out)
                orig = jnp.take_along_axis(ci, fi, axis=1)
                return jnp.stack([fs, orig.astype(jnp.float32)])

            return run

        key = ("query_fused_rerank", e_dims, r_dims, B, T, Pq, capacity,
               Ld, search_type, K, k_out, prefetch)
        return engine.program(key, build)

    # -- rerank token cache ---------------------------------------------------
    def _rerank_doc_cache(self, coll) -> tuple[jax.Array, int]:
        """Device-resident (capacity, Ld) reranker-token rows for ``coll``
        plus the longest row's true length (for in-program width bucketing).

        Rows are ``passage </s>`` ids padded with -1; the query prefix
        ``<s> q </s></s>`` concatenates on device. The store is append-only,
        so the host mirror extends incrementally; a recreated collection
        (different uid) rebuilds from scratch.
        """
        tok = self.reranker._tok
        Ld = self.reranker.config.fused_doc_tokens
        with self._rr_lock:
            cached = self._rr_cache.get(coll.name)
            host = None
            start = 0
            max_len = 1
            if cached is not None and cached[0] == coll.uid:
                if cached[1] == coll.count and \
                        cached[2].shape[0] == coll.capacity:
                    return cached[3], cached[4]
                if cached[1] <= coll.count:
                    start = cached[1]
                    host = cached[2]
                    max_len = cached[4]
                    if host.shape[0] != coll.capacity:  # grown bucket
                        grown = np.full((coll.capacity, Ld), -1, np.int32)
                        grown[: host.shape[0]] = host
                        host = grown
            if host is None:
                host = np.full((coll.capacity, Ld), -1, np.int32)
            for i in range(start, coll.count):
                ids = tok.encode(
                    coll.payloads[i]["text"], add_special=False
                )[: Ld - 1]
                ids.append(tok.sep_id)
                host[i, : len(ids)] = ids
                max_len = max(max_len, len(ids))
            dev = jax.device_put(host)
            self._rr_cache[coll.name] = (
                coll.uid, coll.count, host, dev, max_len,
            )
            return dev, max_len

    # -- public API ----------------------------------------------------------
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

        do_rerank = bool(rerank and self.reranker is not None)
        if do_rerank and getattr(self.reranker, "_params", None) is not None:
            try:
                return self._query_device_rerank(
                    queries, ids, B, T, coll, dev, search_type,
                    top_k, initial_k,
                )
            except Exception as exc:
                # graceful degradation (reference reranking/bge.py:125-136):
                # fall through to the two-program path
                log.warning("fused rerank failed (%s); two-program path", exc)

        fetch_k = initial_k if do_rerank else top_k
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

        if not do_rerank:
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

    def _query_device_rerank(
        self, queries, ids_embed, B, T, coll, dev, search_type,
        top_k, initial_k,
    ) -> list[list[RetrievalResult]]:
        """Single-dispatch path: embed→search→rerank in one device program."""
        rtok = self.reranker._tok
        rr_docs, doc_max = self._rerank_doc_cache(coll)
        # passage width: pow-2 bucket of the longest cached row (the cache
        # is allocated at the config cap, but attention cost is quadratic
        # in pair length — don't pay for width no passage uses)
        Ld = _bucket(doc_max, 16, int(rr_docs.shape[1]))

        # query prefix rows: <s> q </s></s>, -1 padded
        max_len = min(self.reranker.config.max_length, self.reranker.dims.max_len)
        pq_budget = max(max_len - Ld, 16)
        rq_seqs = []
        for q in queries:
            s = rtok.encode(q)[: pq_budget - 1]  # <s> q </s> (truncated)
            rq_seqs.append(s + [rtok.sep_id])
        Pq = _bucket(max(len(s) for s in rq_seqs), 16, pq_budget)
        rq, _ = pad_batch(rq_seqs, Pq, -1)
        if len(rq_seqs) < B:
            rq = np.pad(rq, ((0, B - len(rq_seqs)), (0, 0)),
                        constant_values=-1)

        n_cand = min(initial_k, coll.count)
        # candidate pool: exactly initial_k at steady state (config-stable,
        # so one compile variant — and no wasted cross-encoder rows); pow-2
        # bucketed only while the corpus is still smaller than initial_k
        if coll.count >= initial_k:
            K = initial_k
        else:
            K = min(1 << (max(n_cand, 1) - 1).bit_length(), coll.capacity)
        k_out = min(1 << (max(min(top_k, coll.count), 1) - 1).bit_length(), K)
        run = self._fused_rerank_program(
            B, T, Pq, coll.capacity, Ld, search_type, K, k_out,
            float(self.store.config.rrf_k), rrf_prefetch(n_cand),
        )
        packed = np.asarray(run(
            self.embedder._params, self.reranker._params,
            jnp.asarray(ids_embed), jnp.asarray(rq),
            jnp.asarray(np.int32(n_cand)),
            dev["dense"], dev["doc_tokens"], dev["doc_weights"],
            dev["valid_mask"], rr_docs, dev.get("scales"),
        ))
        scores = packed[0][: len(queries), :top_k]
        idx = packed[1][: len(queries), :top_k].astype(np.int64)

        out: list[list[RetrievalResult]] = []
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
            out.append(row)
        return out
