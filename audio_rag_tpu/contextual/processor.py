"""Contextual retrieval: LLM-generated chunk headers.

Parity surface: reference ``contextual/processor.py:30-207`` (Anthropic-style
contextual retrieval): for each chunk, prompt the LLM with the chunk plus
±window_size neighbour texts (truncated to 200 chars each) and prepend the
returned 1-2 sentence situating context as ``[Context: ...]\\n``; the
original text is preserved in metadata.

Perf note: this is the reference's slowest ingest stage (~10 min/audio-hour,
SURVEY.md hot loop #4) because it makes one serial Ollama HTTP call per
chunk. Here chunks are processed through the on-mesh generator; the API is
batch-shaped so the continuous-batching scheduler can overlap decodes.
"""

from __future__ import annotations

import time

from audio_rag_tpu.config.schema import ContextualConfig
from audio_rag_tpu.core.base import BaseGenerator
from audio_rag_tpu.core.types import AudioChunk
from audio_rag_tpu.utils.decorators import timed
from audio_rag_tpu.utils.logging import get_logger

log = get_logger(__name__)

__all__ = ["ContextualProcessor", "CONTEXT_PROMPT"]

CONTEXT_PROMPT = (
    "You are indexing a transcript for search. Given a chunk and its "
    "surrounding context, write 1-2 sentences situating the chunk in the "
    "overall recording (topic, what is being discussed). Reply with the "
    "situating sentences only.\n\n"
    "Surrounding context:\n{context}\n\n"
    "Chunk ({speaker} at {start:.0f}s-{end:.0f}s):\n{chunk}\n\n"
    "Situating context:"
)

NEIGHBOR_TRUNCATE = 200  # chars per neighbour, reference processor.py:96


def extractive_headers(
    chunks: list[AudioChunk], window_size: int, top_n: int = 4
) -> list[str | None]:
    """Deterministic non-neural headers: per chunk, the ``top_n``
    tf·idf-salient terms from its ±``window_size`` neighbours that the
    chunk itself does not contain.

    This is the document-level-context mechanism of Anthropic-style
    contextual retrieval (reference ``contextual/processor.py:30-207``)
    without the LLM: a chunk that refers to its subject elliptically
    ("it converges quadratically...") becomes retrievable by the subject
    term its neighbour names. Two guards keep headers from *hurting*
    retrieval (measured on the eval sweep): a term must occur ≥2× in the
    window (one-off identifiers — section numbers, citations — quoted
    into a header make the chunk a false lexical match for them; a
    repeated term is what the neighbourhood is actually about), and idf
    is computed over this call's chunks (one file = one document
    collection) so scaffold/filler words that appear everywhere rank
    last.
    """
    import math

    from audio_rag_tpu.text.tokenizer import norm_tokens

    # norm_tokens (not raw split): a punctuated token like
    # "quadratically." would dodge the w-not-in-own exclusion and quote
    # junk like "(see" into the header; the store's lexical stats
    # tokenize the same way, so header terms match what search indexes
    texts = [norm_tokens(c.text) for c in chunks]
    n = len(texts)
    df: dict[str, int] = {}
    for words in texts:
        for w in set(words):
            df[w] = df.get(w, 0) + 1
    headers: list[str | None] = []
    for i in range(n):
        own = set(texts[i])
        tf: dict[str, int] = {}
        for j in range(max(0, i - window_size),
                       min(n, i + window_size + 1)):
            if j == i:
                continue
            for w in texts[j]:
                if w not in own:
                    tf[w] = tf.get(w, 0) + 1
        scored = sorted(
            ((cnt * math.log((n + 1) / (1 + df[w])), w)
             for w, cnt in tf.items()
             # ≥2 occurrences in the window AND not file-common (a term
             # in >1/4 of the file's chunks is filler; quoting it shifts
             # the chunk's embedding for zero retrieval information —
             # df==1 always passes so short 2-3 chunk files still work)
             if cnt >= 2 and (df[w] == 1 or 4 * df[w] <= n)),
            key=lambda sw: (-sw[0], sw[1]),  # deterministic tie-break
        )
        terms = [w for s, w in scored[:top_n] if s > 0]
        headers.append("near: " + ", ".join(terms) if terms else None)
    return headers

#: chars of chunk text quoted in the header prompt. The reference's chunks
#: are naturally small (word-window chunker), but a degenerate transcript
#: can land a whole file in one chunk — unclamped, an hour-long chunk
#: tokenized to a seq-8184 prefill bucket whose compile OOMed the backend
#: (measured). Head+tail excerpt keeps the situating signal.
CHUNK_TRUNCATE = 4000


def _clip_chunk_text(text: str) -> str:
    if len(text) <= CHUNK_TRUNCATE:
        return text
    head = (2 * CHUNK_TRUNCATE) // 3
    tail = CHUNK_TRUNCATE - head
    return f"{text[:head]}\n[... transcript elided ...]\n{text[-tail:]}"


class ContextualProcessor:
    def __init__(
        self,
        config: ContextualConfig | None = None,
        generator: BaseGenerator | None = None,
    ):
        self.config = config or ContextualConfig()
        self.generator = generator

    def generate_context(
        self, chunk: AudioChunk, neighbors: list[AudioChunk]
    ) -> str | None:
        if self.generator is None:
            return None
        if not self.generator.is_loaded:
            try:
                self.generator.load()
            except Exception as exc:
                log.warning("contextual generator reload failed: %s", exc)
                return None
        ctx = "\n".join(
            f"- {n.text[:NEIGHBOR_TRUNCATE]}" for n in neighbors
        ) or "(none)"
        prompt = CONTEXT_PROMPT.format(
            context=ctx,
            speaker=chunk.speaker or "unknown",
            start=chunk.start,
            end=chunk.end,
            chunk=_clip_chunk_text(chunk.text),
        )
        try:
            out = self.generator.generate(prompt, max_tokens=96,
                                          temperature=0.3)
            return out.strip() or None
        except Exception as exc:
            log.warning("contextual header failed for %s: %s",
                        chunk.chunk_id, exc)
            return None

    def _build_prompt(self, chunk: AudioChunk,
                      neighbors: list[AudioChunk]) -> str:
        ctx = "\n".join(
            f"- {n.text[:NEIGHBOR_TRUNCATE]}" for n in neighbors
        ) or "(none)"
        return CONTEXT_PROMPT.format(
            context=ctx,
            speaker=chunk.speaker or "unknown",
            start=chunk.start,
            end=chunk.end,
            chunk=_clip_chunk_text(chunk.text),
        )

    def _gen_batch_retry(self, gen_batch, prompts: list[str]) -> list[str]:
        """One retry after a short drain pause on device-memory failures.

        The header batch usually runs right after the ResourceManager
        swapped whisper out for the LLM; on this runtime buffer frees are
        asynchronous, so the first decode can race the in-flight
        deallocations and hit RESOURCE_EXHAUSTED on a chip that fits
        (engine.sync docstring). A 2 s pause + sync lets the frees land;
        anything else (or a second failure) propagates to the caller's
        degrade-to-no-header path.
        """
        try:
            return gen_batch(prompts, max_tokens=96, temperature=0.3)
        except Exception as exc:
            if "RESOURCE_EXHAUSTED" not in str(exc):
                raise
            log.warning("contextual batch hit %s; draining frees and "
                        "retrying once", type(exc).__name__)
            time.sleep(2.0)
            try:
                from audio_rag_tpu.engine.engine import get_engine

                get_engine().sync()
            except Exception:  # pragma: no cover
                pass
            return gen_batch(prompts, max_tokens=96, temperature=0.3)

    @timed
    def process_chunks(self, chunks: list[AudioChunk]) -> list[AudioChunk]:
        """Prepend ``[Context: ...]`` headers; original text kept in
        metadata['original_text'] (reference processor.py:133-201).

        All headers for a file generate as batched device calls when the
        generator supports ``generate_batch`` — the reference's slowest
        ingest stage (one serial Ollama call per chunk) becomes a handful
        of batched decodes.
        """
        if not self.config.enabled:
            return chunks
        if self.config.backend == "extractive":
            headers = extractive_headers(
                chunks, self.config.window_size,
                self.config.extractive_terms)
            return self._apply_headers(chunks, headers)
        if self.generator is None:
            return chunks
        # the ResourceManager may have evicted the generator since the
        # last file (whisper↔llama swap under the HBM budget during
        # ingest); re-load rather than failing the whole stage
        if not self.generator.is_loaded:
            try:
                self.generator.load()
            except Exception as exc:
                log.warning("contextual generator reload failed: %s", exc)
                return chunks
        w = self.config.window_size
        prompts = []
        for i, chunk in enumerate(chunks):
            neighbors = [
                chunks[j]
                for j in range(max(0, i - w), min(len(chunks), i + w + 1))
                if j != i
            ]
            prompts.append(self._build_prompt(chunk, neighbors))

        headers: list[str | None]
        gen_batch = getattr(self.generator, "generate_batch", None)
        if callable(gen_batch):
            headers = []
            BATCH = 16
            for i in range(0, len(prompts), BATCH):
                try:
                    headers.extend(self._gen_batch_retry(
                        gen_batch, prompts[i: i + BATCH]))
                except Exception as exc:
                    log.warning("batched contextual headers failed: %s", exc)
                    headers.extend([None] * len(prompts[i: i + BATCH]))
        else:
            headers = []
            for p in prompts:
                try:
                    headers.append(self.generator.generate(
                        p, max_tokens=96, temperature=0.3
                    ))
                except Exception as exc:
                    log.warning("contextual header failed: %s", exc)
                    headers.append(None)

        return self._apply_headers(chunks, headers)

    @staticmethod
    def _apply_headers(
        chunks: list[AudioChunk], headers: list[str | None]
    ) -> list[AudioChunk]:
        out: list[AudioChunk] = []
        for chunk, header in zip(chunks, headers):
            header = (header or "").strip() or None
            if header:
                out.append(AudioChunk(
                    text=f"[Context: {header}]\n{chunk.text}",
                    start=chunk.start,
                    end=chunk.end,
                    speaker=chunk.speaker,
                    chunk_id=chunk.chunk_id,
                    metadata={**chunk.metadata, "original_text": chunk.text,
                              "contextualized": True},
                ))
            else:
                out.append(chunk)
        return out
