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
        if not self._device:
            mask = np.zeros(self.capacity, bool)
            mask[: self.count] = True
            put_rows, put_vec = _row_placers(self.capacity)
            dev: dict[str, jax.Array] = {
                "doc_tokens": put_rows(self.doc_tokens),
                "doc_weights": put_rows(self.doc_weights),
                "valid_mask": put_vec(mask),
            }
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
                coll.count += 1
            coll.invalidate_device()
            if self.config.persist_dir:
                self._persist(coll)
            return len(chunks)

    def _metadata_mask(
        self, coll: Collection, metadata_filter: dict[str, Any] | None
    ) -> np.ndarray:
        mask = np.zeros(coll.capacity, bool)
        mask[: coll.count] = True
        if metadata_filter:
            for i in range(coll.count):
                md = coll.payloads[i]["metadata"]
                if any(md.get(k) != v for k, v in metadata_filter.items()):
                    mask[i] = False
        return mask

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

        with self._lock:  # atomic snapshot vs concurrent add()/regrow
            dev = coll.device_arrays()
            capacity = coll.capacity
            count = coll.count
            payloads = coll.payloads
        qd = np.zeros((1, coll.dim), np.float32)
        if query_embedding.dense is not None:
            v = np.asarray(query_embedding.dense, np.float32)
            n = float(np.linalg.norm(v))
            qd[0] = v / n if n > 0 else v
        qt, qw = self._pad_sparse(
            query_embedding.sparse, self.config.max_query_nnz
        )
        if metadata_filter:
            mask = jax.device_put(self._metadata_mask(coll, metadata_filter))
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
