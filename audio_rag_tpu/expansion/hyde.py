"""HyDE query expansion (Hypothetical Document Embeddings).

Parity surface: reference ``expansion/hyde.py:21-123``: the LLM writes a
hypothetical 2-3 paragraph answer passage (temperature 0.7 + 0.1·i per
hypothesis, ≤256 tokens) which is embedded *instead of* the raw query;
falls back to the original query when the generator is unavailable or
fails. Here the hypotheses come from the on-mesh generator, so the
"+1.5 s Ollama hop" in the reference's latency budget disappears.
"""

from __future__ import annotations

from audio_rag_tpu.config.schema import ExpansionConfig
from audio_rag_tpu.core.base import BaseGenerator
from audio_rag_tpu.utils.logging import get_logger

log = get_logger(__name__)

__all__ = ["HyDEExpander", "HYDE_PROMPT"]

HYDE_PROMPT = (
    "Write a short passage (2-3 paragraphs) that directly answers the "
    "question below, as it might appear in a lecture transcript. Write the "
    "passage only, no preamble.\n\nQuestion: {query}\n\nPassage:"
)


class HyDEExpander:
    def __init__(
        self,
        config: ExpansionConfig | None = None,
        generator: BaseGenerator | None = None,
    ):
        self.config = config or ExpansionConfig()
        self.generator = generator

    def is_available(self) -> bool:
        return (
            self.generator is not None and self.generator.check_availability()
        )

    def expand(self, query: str) -> list[str]:
        """Return hypothesis passages; [query] when expansion unavailable."""
        if not self.is_available():
            return [query]
        out: list[str] = []
        for i in range(self.config.num_hypotheses):
            try:
                passage = self.generator.generate(
                    HYDE_PROMPT.format(query=query),
                    max_tokens=256,
                    temperature=0.7 + 0.1 * i,
                )
                if passage.strip():
                    out.append(passage.strip())
            except Exception as exc:
                log.warning("HyDE hypothesis %d failed: %s", i, exc)
        return out or [query]

    def expand_single(self, query: str) -> str:
        return self.expand(query)[0]
