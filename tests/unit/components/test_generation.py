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
