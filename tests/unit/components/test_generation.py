"""LLM generator backend: batched generation, padding masks, contextual
batching, HyDE."""

import numpy as np
import pytest

from audio_rag_tpu.config.schema import (
    ContextualConfig,
    ExpansionConfig,
    GenerationConfig,
)
from audio_rag_tpu.generation.llm_jax import LLMGenerator


@pytest.fixture(scope="module")
def gen():
    g = LLMGenerator(GenerationConfig(model="test", temperature=0.0))
    g.load()
    return g


class TestLLMGenerator:
    def test_generate_returns_text(self, gen):
        out = gen.generate("hello world", max_tokens=8)
        assert isinstance(out, str)

    def test_generate_batch_matches_single(self, gen):
        """Left-padded batched decode must equal per-prompt decode (the
        attention mask hides pads)."""
        prompts = ["alpha beta gamma", "one two three four five six seven"]
        batched = gen.generate_batch(prompts, max_tokens=6)
        singles = [gen.generate(p, max_tokens=6) for p in prompts]
        assert batched == singles

    def test_batch_bucket_pads_to_pow2(self, gen):
        """A 3-prompt batch rides the 4-row program (pow-2 bucket); filler
        rows must not leak into the returned results."""
        prompts = ["alpha beta", "one two three", "zeta eta theta iota"]
        batched = gen.generate_batch(prompts, max_tokens=5)
        assert len(batched) == 3
        singles = [gen.generate(p, max_tokens=5) for p in prompts]
        assert batched == singles

    def test_batch_deterministic_at_t0(self, gen):
        a = gen.generate_batch(["x y z"], max_tokens=5)
        b = gen.generate_batch(["x y z"], max_tokens=5)
        assert a == b

    def test_empty_batch(self, gen):
        assert gen.generate_batch([]) == []

    def test_stream_yields_chunks(self, gen):
        parts = list(gen.generate_stream("hello", max_tokens=6))
        assert "".join(parts).strip() == gen.generate("hello", max_tokens=6)


class TestContextualBatching:
    def test_headers_via_generate_batch(self, gen):
        from audio_rag_tpu.contextual.processor import ContextualProcessor
        from audio_rag_tpu.core.types import AudioChunk

        proc = ContextualProcessor(
            ContextualConfig(enabled=True, window_size=1), gen
        )
        chunks = [
            AudioChunk(f"chunk text {i}", float(i), float(i + 1),
                       chunk_id=f"c{i}")
            for i in range(3)
        ]
        out = proc.process_chunks(chunks)
        assert len(out) == 3
        # tiny random model produces *some* header text or falls through
        assert all(
            c.metadata.get("contextualized") or c.text.startswith("chunk")
            for c in out
        )


class TestHyDE:
    def test_expand_uses_generator(self, gen):
        from audio_rag_tpu.expansion.hyde import HyDEExpander

        ex = HyDEExpander(ExpansionConfig(backend="hyde",
                                          num_hypotheses=1), gen)
        out = ex.expand("what is gradient descent")
        assert len(out) == 1
        assert isinstance(out[0], str) and out[0]

    def test_expand_without_generator_returns_query(self):
        from audio_rag_tpu.expansion.hyde import HyDEExpander

        ex = HyDEExpander(ExpansionConfig(backend="hyde"), None)
        assert ex.expand("q") == ["q"]


class TestExtractiveHeaders:
    def test_elliptical_chunk_gains_neighbor_subject(self):
        """The neighbour's repeated subject term (and nothing one-off,
        like its section tag) must land in the header."""
        from audio_rag_tpu.contextual.processor import ContextualProcessor
        from audio_rag_tpu.core.types import AudioChunk

        chunks = [
            AudioChunk("section s1 covers adam covers adam optimizer notes",
                       0.0, 1.0, chunk_id="a"),
            AudioChunk("section s2 covers it and it converges quickly",
                       1.0, 2.0, chunk_id="b"),
        ]
        proc = ContextualProcessor(ContextualConfig(
            enabled=True, backend="extractive", window_size=1))
        out = proc.process_chunks(chunks)  # no generator needed
        assert "adam" in out[1].text.split("\n")[0]
        assert "s1" not in out[1].text.split("\n")[0]  # tf==1: excluded
        assert out[1].metadata["original_text"].startswith("section s2")

    def test_no_salient_terms_leaves_chunk_unchanged(self):
        from audio_rag_tpu.contextual.processor import ContextualProcessor
        from audio_rag_tpu.core.types import AudioChunk

        chunks = [
            AudioChunk("alpha beta gamma", 0.0, 1.0, chunk_id="a"),
            AudioChunk("delta epsilon zeta", 1.0, 2.0, chunk_id="b"),
        ]
        proc = ContextualProcessor(ContextualConfig(
            enabled=True, backend="extractive", window_size=1))
        out = proc.process_chunks(chunks)
        assert [c.text for c in out] == [c.text for c in chunks]


class TestPRF:
    def _store(self, texts):
        from audio_rag_tpu.config.schema import (EmbeddingConfig,
                                                 RetrievalConfig)
        from audio_rag_tpu.core.types import AudioChunk
        from audio_rag_tpu.embeddings.fake import FakeEmbedder
        from audio_rag_tpu.retrieval.tpu_store import TPUVectorStore

        emb = FakeEmbedder(EmbeddingConfig(backend="fake"))
        emb.load()
        store = TPUVectorStore(RetrievalConfig(capacity_step=128))
        chunks = [AudioChunk(t, float(i), float(i + 1), chunk_id=f"c{i}")
                  for i, t in enumerate(texts)]
        store.add(chunks, emb.embed(texts))
        return emb, store

    def test_mines_cooccurring_canonical_term(self):
        """Alias appears only in two bridge docs alongside the canonical
        term; PRF must append the canonical term (anchored mining)."""
        from audio_rag_tpu.expansion.prf import PRFExpander

        filler = "lorem ipsum dolor sit amet".split()
        texts = [f"note {i} " + " ".join(filler) for i in range(20)]
        texts += [
            "bridge one alias7 means canon9 " + " ".join(filler),
            "bridge two canon9 aka alias7 " + " ".join(filler),
        ]
        emb, store = self._store(texts)
        ex = PRFExpander(ExpansionConfig(backend="prf"), emb, store)
        out = ex.expand_single("explain alias7 please")
        assert "canon9" in out.split()
        assert out.startswith("explain alias7 please")

    def test_precise_query_is_not_expanded(self):
        """A query whose rare term matches exactly one doc has one anchor
        → no expansion (drift guard)."""
        from audio_rag_tpu.expansion.prf import PRFExpander

        texts = [f"generic text number {i} shared words" for i in range(10)]
        texts += ["unique identifier zq77 lives here only"]
        emb, store = self._store(texts)
        ex = PRFExpander(ExpansionConfig(backend="prf"), emb, store)
        assert ex.expand_single("where is zq77") == "where is zq77"

    def test_store_term_stats_cached_and_normalized(self):
        from audio_rag_tpu.expansion.prf import PRFExpander  # noqa: F401

        emb, store = self._store(
            ["[Context: near: adam]\nchunk body", "plain body"])
        n, df = store.term_stats()
        assert n == 2
        assert df.get("adam") == 1  # bracketed header token normalized
        n2, df2 = store.term_stats()
        assert df2 is df  # cache hit at unchanged count
