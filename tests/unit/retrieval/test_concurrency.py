"""Store concurrency: concurrent add() and search() must never crash or
return torn results (readers hold immutable device snapshots; writers
rebind rather than mutate — the SURVEY §5 manual-concurrency contract)."""

import threading

import numpy as np

from audio_rag_tpu.config.schema import RetrievalConfig
from audio_rag_tpu.core.types import AudioChunk, EmbeddingResult, SparseVector
from audio_rag_tpu.retrieval.tpu_store import TPUVectorStore


def _make(n, dim, seed, tag):
    rng = np.random.default_rng(seed)
    chunks, embs = [], []
    for i in range(n):
        chunks.append(AudioChunk(
            text=f"{tag} {i}", start=float(i), end=float(i + 1),
            chunk_id=f"{tag}{i}", metadata={"tag": tag},
        ))
        ids = np.unique(rng.integers(4, 5000, size=12)).astype(np.int32)
        embs.append(EmbeddingResult(
            dense=rng.standard_normal(dim).astype(np.float32),
            sparse=SparseVector(ids, rng.random(ids.size).astype(np.float32)),
        ))
    return chunks, embs


def test_concurrent_add_and_search_consistent():
    dim = 32
    store = TPUVectorStore(RetrievalConfig(capacity_step=128))
    chunks, embs = _make(16, dim, 0, "base")
    store.add(chunks, embs)

    errors: list[Exception] = []
    stop = threading.Event()

    def writer():
        try:
            for batch in range(6):  # forces several capacity regrows
                c, e = _make(64, dim, batch + 1, f"w{batch}")
                store.add(c, e)
        except Exception as exc:  # pragma: no cover
            errors.append(exc)
        finally:
            stop.set()

    def reader():
        rng = np.random.default_rng(99)
        try:
            while not stop.is_set():
                q = EmbeddingResult(
                    dense=rng.standard_normal(dim).astype(np.float32),
                    sparse=SparseVector([5, 10], [1.0, 0.5]),
                )
                res = store.search(q, top_k=5, search_type="hybrid")
                # torn results would surface as missing payloads/dup ids
                ids = [r.chunk_id for r in res]
                assert len(ids) == len(set(ids))
                for r in res:
                    assert r.text
                # filtered search exercises the lazily-built index columns
                store.search(q, top_k=5, metadata_filter={"tag": "base"})
        except Exception as exc:  # pragma: no cover
            errors.append(exc)

    threads = [threading.Thread(target=writer)] + [
        threading.Thread(target=reader) for _ in range(2)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
    assert not errors, errors
    assert store.count() == 16 + 6 * 64
    # post-race sanity: a filtered search sees exactly the base rows
    q = EmbeddingResult(dense=np.ones(dim, np.float32))
    res = store.search(q, top_k=32, search_type="dense",
                       metadata_filter={"tag": "base"})
    assert len(res) == 16
