"""Vector store tests with synthetic embeddings (no models needed) —
the fake-backend strategy SURVEY.md §4 recommends."""

import numpy as np
import pytest

from audio_rag_tpu.config.schema import RetrievalConfig
from audio_rag_tpu.core.types import AudioChunk, EmbeddingResult, SparseVector
from audio_rag_tpu.retrieval.tpu_store import TPUVectorStore


def make_corpus(n=20, dim=32, seed=0):
    rng = np.random.default_rng(seed)
    chunks, embs = [], []
    for i in range(n):
        chunks.append(
            AudioChunk(
                text=f"chunk {i}",
                start=float(i),
                end=float(i + 1),
                speaker=f"SPEAKER_{i % 3:02d}",
                chunk_id=f"c{i}",
                metadata={"source": "a.wav" if i % 2 == 0 else "b.wav"},
            )
        )
        dense = rng.standard_normal(dim).astype(np.float32)
        sparse = SparseVector([i, 1000 + i, 5000], [1.0, 0.5, 0.1])
        embs.append(EmbeddingResult(dense=dense, sparse=sparse))
    return chunks, embs


@pytest.fixture
def store():
    return TPUVectorStore(RetrievalConfig(capacity_step=128))


class TestAdd:
    def test_add_and_count(self, store):
        chunks, embs = make_corpus(5)
        assert store.add(chunks, embs) == 5
        assert store.count() == 5
        assert store.collection_exists()
        assert not store.collection_exists("other")

    def test_add_grows_capacity(self, store):
        chunks, embs = make_corpus(5)
        store.add(chunks, embs)
        chunks2, embs2 = make_corpus(200, seed=1)
        store.add(chunks2, embs2)
        assert store.count() == 205
        info = store.collection_info()
        assert info["capacity"] >= 205
        assert info["capacity"] % 128 == 0

    def test_mismatched_lengths_raise(self, store):
        chunks, embs = make_corpus(3)
        from audio_rag_tpu.core.exceptions import RetrievalError

        with pytest.raises(RetrievalError):
            store.add(chunks, embs[:2])

    def test_dim_mismatch_raises(self, store):
        from audio_rag_tpu.core.exceptions import RetrievalError

        chunks, embs = make_corpus(2, dim=16)
        store.add(chunks, embs)
        chunks2, embs2 = make_corpus(2, dim=32)
        with pytest.raises(RetrievalError, match="dim mismatch"):
            store.add(chunks2, embs2)


class TestDenseSearch:
    def test_exact_ranking_matches_numpy(self, store):
        chunks, embs = make_corpus(50, dim=16)
        store.add(chunks, embs)
        q = np.asarray(embs[7].dense)
        res = store.search(
            EmbeddingResult(dense=q), top_k=5, search_type="dense"
        )
        # numpy reference: cosine similarity
        mat = np.stack([e.dense / np.linalg.norm(e.dense) for e in embs])
        ref = np.argsort(-(mat @ (q / np.linalg.norm(q))))[:5]
        got = [int(r.chunk_id[1:]) for r in res]
        assert got == ref.tolist()
        assert res[0].chunk_id == "c7"  # self-match first
        assert res[0].score == pytest.approx(1.0, abs=1e-4)

    def test_top_k_limit(self, store):
        chunks, embs = make_corpus(10)
        store.add(chunks, embs)
        assert len(store.search(EmbeddingResult(dense=embs[0].dense),
                                top_k=3, search_type="dense")) == 3

    def test_score_threshold(self, store):
        chunks, embs = make_corpus(10)
        store.add(chunks, embs)
        res = store.search(
            EmbeddingResult(dense=embs[0].dense),
            top_k=10,
            search_type="dense",
            score_threshold=0.99,
        )
        assert [r.chunk_id for r in res] == ["c0"]

    def test_empty_collection(self, store):
        assert store.search(EmbeddingResult(dense=np.ones(4, np.float32))) == []


class TestSparseSearch:
    def test_exact_token_match_wins(self, store):
        chunks, embs = make_corpus(20)
        store.add(chunks, embs)
        q = EmbeddingResult(
            dense=np.zeros(32, np.float32),
            sparse=SparseVector([3, 1003], [1.0, 1.0]),
        )
        res = store.search(q, top_k=3, search_type="sparse")
        assert res[0].chunk_id == "c3"
        # score = 1.0*1.0 (tok 3) + 1.0*0.5 (tok 1003)
        assert res[0].score == pytest.approx(1.5)

    def test_shared_token_scores_all(self, store):
        chunks, embs = make_corpus(10)
        store.add(chunks, embs)
        q = EmbeddingResult(
            dense=np.zeros(32, np.float32),
            sparse=SparseVector([5000], [2.0]),
        )
        res = store.search(q, top_k=10, search_type="sparse")
        assert len(res) == 10
        for r in res:
            assert r.score == pytest.approx(0.2)  # 2.0 * 0.1


class TestHybridSearch:
    def test_rrf_fuses_both_signals(self, store):
        chunks, embs = make_corpus(30, dim=16)
        store.add(chunks, embs)
        q = EmbeddingResult(
            dense=np.asarray(embs[4].dense),
            sparse=SparseVector([4, 1004], [1.0, 0.5]),
        )
        res = store.search(q, top_k=5, search_type="hybrid")
        # doc 4 is rank0 in both lists → RRF max
        assert res[0].chunk_id == "c4"
        assert res[0].score == pytest.approx(2 * (1.0 / 2.0), abs=1e-5)

    def test_hybrid_beats_dense_on_lexical_query(self, store):
        """A doc with weak dense but exact lexical match should surface."""
        chunks, embs = make_corpus(20, dim=16)
        store.add(chunks, embs)
        q = EmbeddingResult(
            dense=np.asarray(embs[0].dense),
            sparse=SparseVector([13], [5.0]),  # doc 13's private token
        )
        hybrid = store.search(q, top_k=5, search_type="hybrid")
        ids = [r.chunk_id for r in hybrid]
        assert "c13" in ids and "c0" in ids


class TestMetadataFilter:
    def test_filter_excludes(self, store):
        chunks, embs = make_corpus(10)
        store.add(chunks, embs)
        res = store.search(
            EmbeddingResult(dense=embs[0].dense),
            top_k=10,
            search_type="dense",
            metadata_filter={"source": "b.wav"},
        )
        assert res and all(r.metadata["source"] == "b.wav" for r in res)

    def test_filter_no_match(self, store):
        chunks, embs = make_corpus(4)
        store.add(chunks, embs)
        res = store.search(
            EmbeddingResult(dense=embs[0].dense),
            top_k=5,
            metadata_filter={"source": "zzz.wav"},
        )
        assert res == []


class TestDeviceFilterIndex:
    """Device-side integer-coded payload columns (replacing the host O(N)
    loop): incremental extension, multi-key AND, and the host fallback for
    unhashable values."""

    def test_index_extends_after_append(self, store):
        chunks, embs = make_corpus(6)
        store.add(chunks, embs)
        # first filtered search builds the column
        store.search(EmbeddingResult(dense=embs[0].dense), top_k=6,
                     metadata_filter={"source": "a.wav"})
        more, membs = make_corpus(4)
        for c in more:
            c.metadata["source"] = "new.wav"
        store.add(more, membs)
        res = store.search(EmbeddingResult(dense=membs[0].dense), top_k=10,
                           metadata_filter={"source": "new.wav"})
        assert len(res) == 4
        assert all(r.metadata["source"] == "new.wav" for r in res)

    def test_multi_key_and_semantics(self, store):
        chunks, embs = make_corpus(8)
        for i, c in enumerate(chunks):
            c.metadata["lang"] = "en" if i % 2 == 0 else "de"
        store.add(chunks, embs)
        res = store.search(
            EmbeddingResult(dense=embs[0].dense), top_k=8,
            metadata_filter={"source": "a.wav", "lang": "en"},
        )
        host_expected = [
            c.chunk_id for c in chunks
            if c.metadata["source"] == "a.wav" and c.metadata["lang"] == "en"
        ]
        assert sorted(r.chunk_id for r in res) == sorted(host_expected)

    def test_unhashable_value_falls_back_to_host(self, store):
        chunks, embs = make_corpus(4)
        chunks[1].metadata["tags"] = ["x", "y"]
        store.add(chunks, embs)
        res = store.search(
            EmbeddingResult(dense=embs[1].dense), top_k=4,
            metadata_filter={"tags": ["x", "y"]},
        )
        assert [r.chunk_id for r in res] == [chunks[1].chunk_id]

    def test_missing_key_matches_none(self, store):
        chunks, embs = make_corpus(4)
        chunks[2].metadata["session"] = "s1"
        store.add(chunks, embs)
        res = store.search(
            EmbeddingResult(dense=embs[0].dense), top_k=4,
            metadata_filter={"session": None},
        )
        ids = {r.chunk_id for r in res}
        assert chunks[2].chunk_id not in ids and len(ids) == 3


class TestCollections:
    def test_multiple_collections(self, store):
        chunks, embs = make_corpus(3)
        store.add(chunks, embs, collection="one")
        store.add(chunks[:2], embs[:2], collection="two")
        assert store.count("one") == 3
        assert store.count("two") == 2
        assert store.list_collections() == ["one", "two"]

    def test_delete(self, store):
        chunks, embs = make_corpus(3)
        store.add(chunks, embs)
        assert store.delete_collection()
        assert store.count() == 0
        assert not store.delete_collection()  # already gone


class TestPersistence:
    def test_roundtrip(self, tmp_path):
        cfg = RetrievalConfig(persist_dir=str(tmp_path), capacity_step=128)
        s1 = TPUVectorStore(cfg)
        chunks, embs = make_corpus(12, dim=8)
        s1.add(chunks, embs)

        s2 = TPUVectorStore(cfg)
        assert s2.count() == 12
        res = s2.search(
            EmbeddingResult(dense=embs[3].dense), top_k=1, search_type="dense"
        )
        assert res[0].chunk_id == "c3"
        assert res[0].metadata["source"] == "b.wav"
