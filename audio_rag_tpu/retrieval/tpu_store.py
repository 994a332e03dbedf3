"""HBM-resident vector store — the TPU-native replacement for Qdrant.

Parity surface: reference ``retrieval/qdrant.py:14-382`` (collection
management, upsert with payloads, dense/sparse/hybrid search with RRF fusion,
score threshold, metadata filter, count/delete/exists). Differences by design:

* No external server: collections are host numpy mirrors + device-resident
  arrays; search is one fused XLA program (``ops/similarity.hybrid_search``).
* Exact MIPS instead of HNSW: at audio-RAG corpus scale a single bf16 matmul
  beats a graph walk, and recall is exact.
* Static shapes: capacity grows in ``capacity_step`` buckets so each bucket
  size compiles once; queries are padded to a fixed sparse width.
* Multi-chip: the corpus rows shard over the mesh's data axis; XLA emits the
  all-gather for the final top-k merge.
* Persistence: npz shards + json payloads per collection under
  ``persist_dir`` (replaces Qdrant's storage engine).
"""

from __future__ import annotations

import json
import threading
import uuid
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from audio_rag_tpu.config.schema import RetrievalConfig
from audio_rag_tpu.core.base import BaseRetriever
from audio_rag_tpu.core.exceptions import RetrievalError
from audio_rag_tpu.core.types import (
    AudioChunk,
    EmbeddingResult,
    RetrievalResult,
    SparseVector,
)
from audio_rag_tpu.ops.similarity import hybrid_search, rrf_prefetch
from audio_rag_tpu.retrieval.base import RetrievalRegistry
from audio_rag_tpu.utils.decorators import timed

__all__ = ["TPUVectorStore", "Collection"]


def _intern(vocab: dict[Any, int], value: Any) -> int:
    """Value → stable small int code; unhashable values code to -3 (they can
    never equal a hashable filter value, matching ``md.get(k) != v``)."""
    try:
        return vocab.setdefault(value, len(vocab))
    except TypeError:
        return -3


def _row_placers(capacity: int):
    """(rows, vector) device_put functions, row-sharded over the mesh's
    data axis when it has more than one device."""
    try:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from audio_rag_tpu.parallel.mesh import get_default_mesh

        mesh = get_default_mesh()
        n_data = mesh.shape.get("data", 1)
        if n_data > 1 and capacity % n_data == 0:
            rows = NamedSharding(mesh, P("data", None))
            vec = NamedSharding(mesh, P("data"))
            return (
                lambda x: jax.device_put(x, rows),
                lambda x: jax.device_put(x, vec),
            )
    except Exception:
        pass
    return jax.device_put, jax.device_put


@dataclass
class Collection:
    """One namespace of chunks: host mirrors + lazily-synced device arrays."""

    name: str
    dim: int
    max_doc_nnz: int
    capacity: int
    count: int = 0
    dense: np.ndarray | None = None  # (capacity, dim) f32, L2-normalized
    doc_tokens: np.ndarray | None = None  # (capacity, max_doc_nnz) i32, pad -1
    doc_weights: np.ndarray | None = None  # (capacity, max_doc_nnz) f32
    payloads: list[dict[str, Any]] = field(default_factory=list)
    #: lazily-built integer-coded payload columns for device-side metadata
    #: filtering: key → (capacity,) int32 of interned value codes
    #: (-2 = row beyond count, -3 = unhashable value; both match nothing)
    index_cols: dict[str, np.ndarray] = field(default_factory=dict)
    index_vocab: dict[str, dict[Any, int]] = field(default_factory=dict)
    #: int8-quantize the dense matrix on upload (set from RetrievalConfig)
    quantize_dense: bool = False
    #: device copies; dropped whenever host mirrors change
    _device: dict[str, jax.Array] = field(default_factory=dict)
    #: identity stamp for external per-collection caches (e.g. the
    #: QueryEngine's rerank token cache): a recreated collection must not
    #: alias a stale cache even if its id() is reused after GC
    uid: str = field(default_factory=lambda: uuid.uuid4().hex)

    def ensure_capacity(self, n_new: int, step: int) -> None:
        needed = self.count + n_new
        if self.dense is None:
            cap = max(step, ((needed + step - 1) // step) * step)
            self.capacity = cap
            self.dense = np.zeros((cap, self.dim), np.float32)
            self.doc_tokens = np.full((cap, self.max_doc_nnz), -1, np.int32)
            self.doc_weights = np.zeros((cap, self.max_doc_nnz), np.float32)
            return
        if needed > self.capacity:
            cap = ((needed + step - 1) // step) * step
            grow = cap - self.capacity
            self.dense = np.concatenate(
                [self.dense, np.zeros((grow, self.dim), np.float32)]
            )
            self.doc_tokens = np.concatenate(
                [self.doc_tokens, np.full((grow, self.max_doc_nnz), -1, np.int32)]
            )
            self.doc_weights = np.concatenate(
                [self.doc_weights, np.zeros((grow, self.max_doc_nnz), np.float32)]
            )
            for key, col in self.index_cols.items():
                self.index_cols[key] = np.concatenate(
                    [col, np.full(grow, -2, np.int32)]
                )
            self.capacity = cap
            self._device = {}  # rebind, never clear: readers hold snapshots

    def device_arrays(self) -> dict[str, jax.Array]:
        """Upload host mirrors once per mutation; cached across queries.

        Multi-chip: corpus rows shard over the mesh's ``data`` axis
        (capacity is a multiple of ``capacity_step``, which divides by the
        axis size), so scoring runs shard-local and XLA inserts the
        all-gather for the final top-k merge. The no-filter valid mask is
        cached on device too: on this runtime every host↔device interaction
        costs ~28 ms once transfers have begun.
        """
        if "dense" not in self._device:  # filter cols may arrive first
            mask = np.zeros(self.capacity, bool)
            mask[: self.count] = True
            put_rows, put_vec = _row_placers(self.capacity)
            dev: dict[str, jax.Array] = dict(self._device)  # keep filter cols
            dev.update(
                doc_tokens=put_rows(self.doc_tokens),
                doc_weights=put_rows(self.doc_weights),
                valid_mask=put_vec(mask),
            )
            if self.quantize_dense:
                row_max = np.abs(self.dense).max(axis=1)
                scales = np.maximum(row_max, 1e-9) / 127.0
                q = np.clip(
                    np.round(self.dense / scales[:, None]), -127, 127
                ).astype(np.int8)
                dev["dense"] = put_rows(q)
                dev["scales"] = put_vec(scales.astype(np.float32))
            else:
                dev["dense"] = put_rows(self.dense)
            self._device = dev
        return self._device

    def invalidate_device(self) -> None:
        # rebind rather than clear(): concurrent searches keep a reference
        # to the previous (complete, immutable) snapshot
        self._device = {}


@RetrievalRegistry.register("tpu")
class TPUVectorStore(BaseRetriever):
    """In-process, device-resident hybrid vector store."""

    hbm_required_gb = 0.5  # grows with corpus; accounted per add()

    def __init__(self, config: RetrievalConfig | None = None):
        super().__init__()
        self.config = config or RetrievalConfig()
        self._collections: dict[str, Collection] = {}
        self._lock = threading.RLock()
        self._loaded = True  # stateless service; no model weights
        if self.config.persist_dir:
            self._load_all()

    # -- helpers ----------------------------------------------------------
    def _coll(self, name: str | None, create: bool = False,
              dim: int | None = None) -> Collection:
        cname = name or self.config.collection_name
        with self._lock:
            if cname not in self._collections:
                if not create:
                    raise RetrievalError(
                        f"collection {cname!r} does not exist",
                        context={"collection": cname},
                    )
                self._collections[cname] = Collection(
                    name=cname,
                    dim=dim or 0,
                    max_doc_nnz=self.config.max_doc_nnz,
                    capacity=0,
                    quantize_dense=self.config.quantize_dense,
                )
            return self._collections[cname]

    def list_collections(self) -> list[str]:
        with self._lock:
            return sorted(self._collections)

    @staticmethod
    def _pad_sparse(
        sv: SparseVector | None, width: int
    ) -> tuple[np.ndarray, np.ndarray]:
        tok = np.full(width, -1, np.int32)
        w = np.zeros(width, np.float32)
        if sv is not None and sv.nnz:
            n = min(sv.nnz, width)
            if sv.nnz > width:
                # keep the strongest terms
                keep = np.argsort(-sv.values)[:width]
                keep.sort()
                tok[:n] = sv.indices[keep]
                w[:n] = sv.values[keep]
            else:
                tok[:n] = sv.indices
                w[:n] = sv.values
        return tok, w

    # -- API parity with reference QdrantRetriever ------------------------
    @timed
    def add(
        self,
        chunks: list[AudioChunk],
        embeddings: list[EmbeddingResult],
        collection: str | None = None,
    ) -> int:
        if len(chunks) != len(embeddings):
            raise RetrievalError(
                f"chunks/embeddings mismatch: {len(chunks)} vs {len(embeddings)}"
            )
        if not chunks:
            return 0
        dim = embeddings[0].dim
        if dim == 0:
            raise RetrievalError("embeddings must include dense vectors")
        with self._lock:
            coll = self._coll(collection, create=True, dim=dim)
            if coll.dim == 0:
                coll.dim = dim
            if coll.dim != dim:
                raise RetrievalError(
                    f"dim mismatch: collection {coll.dim}, got {dim}",
                    context={"collection": coll.name},
                )
            coll.ensure_capacity(len(chunks), self.config.capacity_step)
            for chunk, emb in zip(chunks, embeddings):
                i = coll.count
                vec = np.asarray(emb.dense, np.float32)
                norm = float(np.linalg.norm(vec))
                coll.dense[i] = vec / norm if norm > 0 else vec
                tok, w = self._pad_sparse(emb.sparse, coll.max_doc_nnz)
                coll.doc_tokens[i] = tok
                coll.doc_weights[i] = w
                coll.payloads.append(
                    {
                        "id": chunk.chunk_id or str(uuid.uuid4()),
                        "text": chunk.text,
                        "start": chunk.start,
                        "end": chunk.end,
                        "speaker": chunk.speaker,
                        "metadata": dict(chunk.metadata),
                    }
                )
                for key in coll.index_cols:
                    coll.index_cols[key][i] = _intern(
                        coll.index_vocab[key], chunk.metadata.get(key)
                    )
                coll.count += 1
            coll.invalidate_device()
            if self.config.persist_dir:
                self._persist(coll)
            return len(chunks)

    def _metadata_mask(
        self, coll: Collection, metadata_filter: dict[str, Any] | None
    ) -> np.ndarray:
        """Host-side O(N) fallback — only for unhashable filter values that
        the interned device columns cannot represent."""
        mask = np.zeros(coll.capacity, bool)
        mask[: coll.count] = True
        if metadata_filter:
            for i in range(coll.count):
                md = coll.payloads[i]["metadata"]
                if any(md.get(k) != v for k, v in metadata_filter.items()):
                    mask[i] = False
        return mask

    def _ensure_index(self, coll: Collection, key: str) -> None:
        """Build the integer-coded payload column for ``key`` (first filtered
        use); subsequent add() calls extend it incrementally."""
        if key in coll.index_cols:
            return
        col = np.full(coll.capacity, -2, np.int32)
        vocab: dict[Any, int] = {}
        for i in range(coll.count):
            col[i] = _intern(vocab, coll.payloads[i]["metadata"].get(key))
        coll.index_cols[key] = col
        coll.index_vocab[key] = vocab

    def _device_filter(
        self, coll: Collection, metadata_filter: dict[str, Any]
    ):
        """(filter_cols tuple, filter_codes (F,) int32 array) for a filtered
        search, or None when a value is unhashable (host fallback). Columns
        are device-cached alongside the corpus arrays (dropped together on
        mutation), so a filtered query uploads only the (F,) code vector."""
        cols: list[jax.Array] = []
        codes: list[int] = []
        for key in sorted(metadata_filter):
            value = metadata_filter[key]
            try:
                hash(value)
            except TypeError:
                return None
            self._ensure_index(coll, key)
            codes.append(coll.index_vocab[key].get(value, -1))
            dev_key = f"col:{key}"
            if dev_key not in coll._device:
                coll._device[dev_key] = jax.device_put(coll.index_cols[key])
            cols.append(coll._device[dev_key])
        return tuple(cols), np.asarray(codes, np.int32)

    @timed
    def search(
        self,
        query_embedding: EmbeddingResult,
        top_k: int = 5,
        search_type: str = "hybrid",
        collection: str | None = None,
        metadata_filter: dict[str, Any] | None = None,
        score_threshold: float | None = None,
    ) -> list[RetrievalResult]:
        try:
            coll = self._coll(collection)
        except RetrievalError:
            return []
        if coll.count == 0:
            return []
        if search_type not in ("dense", "sparse", "hybrid"):
            raise RetrievalError(f"unknown search_type {search_type!r}")

        filter_cols: tuple = ()
        filter_codes = None
        host_mask = None
        with self._lock:  # atomic snapshot vs concurrent add()/regrow
            dev = coll.device_arrays()
            capacity = coll.capacity
            count = coll.count
            payloads = coll.payloads
            if metadata_filter:
                device_filter = self._device_filter(coll, metadata_filter)
                if device_filter is not None:
                    filter_cols, filter_codes = device_filter
                else:  # unhashable filter value: host O(N) fallback
                    host_mask = self._metadata_mask(coll, metadata_filter)
        qd = np.zeros((1, coll.dim), np.float32)
        if query_embedding.dense is not None:
            v = np.asarray(query_embedding.dense, np.float32)
            n = float(np.linalg.norm(v))
            qd[0] = v / n if n > 0 else v
        # pad the query's sparse terms to the pow-2 bucket of its TRUE nnz:
        # the sparse scorer scans one corpus pass per query slot, so a
        # 12-term query should pay 16 steps, not max_query_nnz (64)
        q_nnz = query_embedding.sparse.nnz if query_embedding.sparse else 0
        q_width = min(
            max(8, 1 << max(q_nnz - 1, 0).bit_length()),
            self.config.max_query_nnz,
        )
        qt, qw = self._pad_sparse(query_embedding.sparse, q_width)
        if host_mask is not None:
            mask = jax.device_put(host_mask)
        else:
            mask = dev["valid_mask"]  # cached on device
        k = min(top_k, count)
        # fused device program: score → fuse → top-k (pad k to cut recompiles)
        k_pad = 1 << (max(k, 1) - 1).bit_length()
        packed = hybrid_search(
            qd,
            qt[None],
            qw[None],
            dev["dense"],
            dev["doc_tokens"],
            dev["doc_weights"],
            mask,
            dev.get("scales"),
            top_k=min(k_pad, capacity),
            search_type=search_type,
            rrf_k=float(self.config.rrf_k),
            # pow-2 bucket of Qdrant's Prefetch(limit=2·k), on the TRUE k —
            # prefetch is static, so raw 2·k values would recompile per
            # requested top_k; must match the fused QueryEngine exactly
            prefetch=rrf_prefetch(k),
            filter_cols=filter_cols,
            filter_codes=(
                None if filter_codes is None else jnp.asarray(filter_codes)
            ),
        )
        packed = np.asarray(packed)  # ONE device→host transfer
        scores = packed[0, 0][:k]
        idx = packed[1, 0][:k].astype(np.int64)

        thr = (
            score_threshold
            if score_threshold is not None
            else (self.config.score_threshold if search_type == "dense" else 0.0)
        )
        out: list[RetrievalResult] = []
        for s, i in zip(scores, idx):
            if s <= -1e29:  # masked slot
                continue
            if thr and s < thr:
                continue
            p = payloads[int(i)]
            out.append(
                RetrievalResult(
                    text=p["text"],
                    score=float(s),
                    start=p["start"],
                    end=p["end"],
                    speaker=p["speaker"],
                    chunk_id=p["id"],
                    metadata=p["metadata"],
                )
            )
        return out

    def count(self, collection: str | None = None) -> int:
        try:
            return self._coll(collection).count
        except RetrievalError:
            return 0

    def term_stats(
        self, collection: str | None = None
    ) -> tuple[int, dict[str, int]]:
        """(n_docs, per-term document frequency) over the collection's
        chunk texts — the lexical statistics PRF expansion
        (:class:`~audio_rag_tpu.expansion.prf.PRFExpander`) weights
        feedback terms with. Host-side, cached per collection size (the
        store is append-only between deletes, so ``count`` is a valid
        cache stamp)."""
        try:
            coll = self._coll(collection)
        except RetrievalError:
            return 0, {}
        with self._lock:
            cached = getattr(coll, "_term_stats_cache", None)
            if cached is not None and cached[0] == coll.count:
                return cached[1], cached[2]
            from audio_rag_tpu.text.tokenizer import norm_tokens

            df: dict[str, int] = {}
            for i in range(coll.count):
                for w in set(norm_tokens(coll.payloads[i]["text"])):
                    df[w] = df.get(w, 0) + 1
            coll._term_stats_cache = (coll.count, coll.count, df)
            return coll.count, df

    def collection_exists(self, collection: str | None = None) -> bool:
        cname = collection or self.config.collection_name
        return cname in self._collections

    def delete_collection(self, collection: str | None = None) -> bool:
        cname = collection or self.config.collection_name
        with self._lock:
            existed = cname in self._collections
            self._collections.pop(cname, None)
            if self.config.persist_dir:
                base = Path(self.config.persist_dir) / cname
                for suffix in (".npz", ".json"):
                    f = base.with_suffix(suffix)
                    if f.exists():
                        f.unlink()
            return existed

    def collection_info(self, collection: str | None = None) -> dict[str, Any]:
        coll = self._coll(collection)
        return {
            "name": coll.name,
            "count": coll.count,
            "capacity": coll.capacity,
            "dim": coll.dim,
            "hbm_bytes": 0 if coll.dense is None else (
                coll.dense.nbytes
                + coll.doc_tokens.nbytes
                + coll.doc_weights.nbytes
            ),
        }

    # -- persistence ------------------------------------------------------
    def _persist(self, coll: Collection) -> None:
        base = Path(self.config.persist_dir)
        base.mkdir(parents=True, exist_ok=True)
        np.savez_compressed(
            base / f"{coll.name}.npz",
            dense=coll.dense[: coll.count],
            doc_tokens=coll.doc_tokens[: coll.count],
            doc_weights=coll.doc_weights[: coll.count],
            dim=np.int64(coll.dim),
        )
        with open(base / f"{coll.name}.json", "w") as f:
            json.dump(coll.payloads, f)

    def _load_all(self) -> None:
        base = Path(self.config.persist_dir)
        if not base.is_dir():
            return
        for npz_path in base.glob("*.npz"):
            name = npz_path.stem
            data = np.load(npz_path)
            payload_path = base / f"{name}.json"
            payloads = (
                json.loads(payload_path.read_text())
                if payload_path.exists()
                else []
            )
            n = int(data["dense"].shape[0])
            coll = Collection(
                name=name,
                dim=int(data["dim"]),
                max_doc_nnz=int(data["doc_tokens"].shape[1]) if n else
                self.config.max_doc_nnz,
                capacity=0,
                quantize_dense=self.config.quantize_dense,
            )
            coll.ensure_capacity(n, self.config.capacity_step)
            coll.dense[:n] = data["dense"]
            coll.doc_tokens[:n] = data["doc_tokens"]
            coll.doc_weights[:n] = data["doc_weights"]
            coll.payloads = payloads
            coll.count = n
            self._collections[name] = coll
