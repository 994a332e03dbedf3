"""Deterministic fake generator for pipeline/e2e tests: echoes a summary
built from the prompt's excerpts."""

from __future__ import annotations

import re

from audio_rag_tpu.config.schema import GenerationConfig
from audio_rag_tpu.core.base import BaseGenerator
from audio_rag_tpu.generation.base import GeneratorRegistry

__all__ = ["FakeGenerator"]


@GeneratorRegistry.register("fake")
class FakeGenerator(BaseGenerator):
    hbm_required_gb = 0.0

    def __init__(self, config: GenerationConfig | None = None):
        super().__init__()
        self.config = config or GenerationConfig()
        self._loaded = True

    def generate(
        self,
        prompt: str,
        system: str | None = None,
        max_tokens: int | None = None,
        temperature: float | None = None,
    ) -> str:
        m = re.search(r"Question:\s*(.+)", prompt)
        question = m.group(1).strip() if m else prompt[:60]
        n_excerpts = len(re.findall(r"\[Excerpt \d+\]", prompt))
        cite = " [Excerpt 1]" if n_excerpts else ""
        return (
            f"Based on {n_excerpts or 'the'} provided excerpt(s), regarding "
            f"'{question}': this is a deterministic fake answer.{cite}"
        )
