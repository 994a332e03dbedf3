"""multilingual-e5 embedder + semantic chunker (schema gaps the reference
left unimplemented) + concurrency safety of the vector store."""

import threading

import numpy as np
import pytest

from audio_rag_tpu.chunking.semantic import SemanticChunker
from audio_rag_tpu.config.schema import ChunkingConfig, EmbeddingConfig
from audio_rag_tpu.core.types import TranscriptSegment
from audio_rag_tpu.embeddings.e5 import E5Embedder


class TestE5:
    @pytest.fixture(scope="class")
    def e5(self):
        e = E5Embedder(EmbeddingConfig(backend="multilingual-e5",
                                       model="test"))
        e.load()
        return e

    def test_dense_only_normalized(self, e5):
        out = e5.embed(["hello world", "short"])
        assert len(out) == 2
        assert out[0].sparse is None
        np.testing.assert_allclose(np.linalg.norm(out[0].dense), 1.0,
                                   atol=1e-5)
        assert out[0].text == "hello world"  # prefix not leaked

    def test_query_vs_passage_prefixes_differ(self, e5):
        q = e5.embed_query("same words here")
        p = e5.embed(["same words here"])[0]
        # E5 embeds queries and passages with different prefixes
        assert not np.allclose(q.dense, p.dense)

    def test_registry_key(self):
        from audio_rag_tpu.embeddings.base import EmbeddingsRegistry

        assert "multilingual-e5" in EmbeddingsRegistry


class TestSemanticChunker:
    def seg(self, text, i):
        return TranscriptSegment(text=text, start=float(i),
                                 end=float(i + 1), speaker="S0")

    def test_topic_shift_splits(self):
        # FakeEmbedder is lexical: repeated-word blocks are similar
        a = [self.seg("alpha beta gamma delta " * 5, i) for i in range(3)]
        b = [self.seg("omega sigma rho tau " * 5, i + 3) for i in range(3)]
        chunker = SemanticChunker(
            ChunkingConfig(max_tokens=2000, min_chunk_tokens=1),
            threshold=0.5,
        )
        chunks = chunker.chunk(a + b)
        assert len(chunks) == 2
        assert "alpha" in chunks[0].text and "omega" in chunks[1].text

    def test_max_tokens_budget(self):
        segs = [self.seg("same words " * 30, i) for i in range(10)]
        chunker = SemanticChunker(
            ChunkingConfig(max_tokens=120, min_chunk_tokens=1),
            threshold=0.0,  # similarity never splits; only the budget does
        )
        chunks = chunker.chunk(segs)
        assert len(chunks) > 1

    def test_empty(self):
        assert SemanticChunker().chunk([]) == []

    def test_registry_key(self):
        from audio_rag_tpu.chunking.base import ChunkingRegistry

        assert "semantic" in ChunkingRegistry


class TestStoreConcurrency:
    def test_concurrent_add_and_search(self):
        """Interleaved writers + readers must never crash or corrupt."""
        from audio_rag_tpu.config.schema import RetrievalConfig
        from audio_rag_tpu.core.types import AudioChunk, EmbeddingResult
        from audio_rag_tpu.retrieval.tpu_store import TPUVectorStore

        store = TPUVectorStore(RetrievalConfig(capacity_step=128))
        rng = np.random.default_rng(0)
        errors: list[Exception] = []

        def writer(tid):
            try:
                for i in range(5):
                    chunks = [AudioChunk(f"t{tid}-{i}-{j}", 0.0, 1.0,
                                         chunk_id=f"{tid}-{i}-{j}")
                              for j in range(10)]
                    embs = [EmbeddingResult(
                        dense=rng.standard_normal(16).astype(np.float32))
                        for _ in range(10)]
                    store.add(chunks, embs)
            except Exception as exc:  # pragma: no cover
                errors.append(exc)

        def reader():
            try:
                q = EmbeddingResult(
                    dense=np.ones(16, np.float32))
                for _ in range(10):
                    store.search(q, top_k=3, search_type="dense")
            except Exception as exc:  # pragma: no cover
                errors.append(exc)

        threads = [threading.Thread(target=writer, args=(t,))
                   for t in range(3)] + [
            threading.Thread(target=reader) for _ in range(2)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert not errors, [repr(e) for e in errors]
        assert store.count() == 150
