"""The committed trained tiny generator (``assets/llm_small.npz``).

Pins the behaviors the random-init LLM family could never show: natural
EOS termination, grounded echo answers over the corpus domain, readable
decoding in a fresh process (vocab sidecar), and judge-prompt direction —
the capabilities the reference gets from a downloaded ollama llama3.2
(``generation/ollama.py:58-96``)."""

import re
from pathlib import Path

import numpy as np
import pytest

ASSET = (Path(__file__).resolve().parents[3] / "audio_rag_tpu" / "assets"
         / "llm_small.npz")


@pytest.mark.skipif(not ASSET.exists(), reason="trained asset not built")
class TestTrainedLLMSmall:
    @pytest.fixture(scope="class")
    def gen(self):
        from audio_rag_tpu.config.schema import GenerationConfig
        from audio_rag_tpu.generation.llm_jax import LLMGenerator

        g = LLMGenerator(GenerationConfig(
            backend="llm-jax", model="eval-small", temperature=0.0,
            use_scheduler=False, max_tokens=64))
        g.load()
        yield g
        g.unload()

    @pytest.fixture(scope="class")
    def corpus(self):
        from audio_rag_tpu.evaluation.corpus import make_corpus

        return make_corpus()

    def _rag_prompt(self, corpus, rng):
        from audio_rag_tpu.core.types import RetrievalResult
        from audio_rag_tpu.generation.prompts import (
            SYSTEM_PROMPT,
            build_rag_prompt,
        )

        t = int(rng.integers(len(corpus.doc_forms)))
        concept = int(rng.integers(4))
        q = (f"what does the lecture say about "
             f"{corpus.query_forms[t][concept]}")
        idxs = [int(j) for j in
                rng.integers(0, len(corpus.chunks), size=4)]
        idxs[0] = int(rng.choice(corpus.relevant_chunks(t, (concept,))))
        res = [RetrievalResult(corpus.chunks[j], 0.8, 30.0 * j,
                               30.0 * j + 30, speaker="SPEAKER_00")
               for j in idxs]
        return (f"{SYSTEM_PROMPT}\n\n{build_rag_prompt(q, res)}",
                corpus.doc_forms[t][concept])

    def test_answers_terminate_and_ground(self, gen, corpus):
        rng = np.random.default_rng(777)
        eos_ok = grounded = 0
        n = 6
        for _ in range(n):
            prompt, doc_form = self._rag_prompt(corpus, rng)
            out = gen.generate(prompt, max_tokens=64)
            if gen.last_token_counts[0] < 64:
                eos_ok += 1
            if doc_form in out:
                grounded += 1
            # fresh-process decodability: no <unk> holes in the answer
            assert "<unk>" not in out, out
        assert eos_ok >= n - 1
        assert grounded >= n - 2

    def test_judge_rating_direction(self, gen, corpus):
        """Mean rating over several faithful answers must clearly exceed
        unfaithful ones, in the PRODUCTION judge format (multiple
        ---joined contexts, as RAGEvaluator.judge_faithfulness builds —
        the format the judge trained on)."""
        rng = np.random.default_rng(4)

        def rate(i, faithful):
            t = corpus.topic_of[i]
            a, b = corpus.pair_of[i]
            if faithful:
                ans = (f"the lecture covers {corpus.doc_forms[t][a]} "
                       f"alongside {corpus.doc_forms[t][b]} in section "
                       f"{corpus.tags[i]}")
            else:
                t2 = (t + 5) % len(corpus.doc_forms)
                ans = (f"the lecture covers {corpus.doc_forms[t2][0]} "
                       f"alongside {corpus.doc_forms[t2][1]} in section "
                       "unknown")
            ctxs = [corpus.chunks[i]] + [
                corpus.chunks[int(j)]
                for j in rng.integers(0, len(corpus.chunks), size=2)]
            ctx = "\n---\n".join(x[:500] for x in ctxs)
            p = ("Rate 0-10 how well the ANSWER is supported by the "
                 "CONTEXTS. Reply with a single number.\n\n"
                 f"QUESTION: what is covered in section {corpus.tags[i]}\n"
                 f"ANSWER: {ans}\nCONTEXTS:\n{ctx}\n\nRating:")
            out = gen.generate(p, max_tokens=4)
            m = re.search(r"\d+", out)
            return float(m.group()) if m else 5.0

        idxs = [17, 42, 101, 163]
        hi = np.mean([rate(i, True) for i in idxs])
        lo = np.mean([rate(i, False) for i in idxs])
        assert hi >= lo + 3, (hi, lo)

    def test_speculative_acceptance_in_extractive_mode(self, gen, corpus):
        """The quote-instruction mode copies the relevant excerpt from
        the prompt — the regime n-gram (prompt-lookup) drafting accepts.
        Paraphrase-style answers measured ~0 acceptance (they copy no
        prompt span); extractive answers must cut weight reads ~2x
        (tokens/verify ≥ 1.5 — the corpus's 10-word filler vocabulary
        makes 2-gram lookup ambiguous in each chunk's tail, so full
        acceptance is unreachable by construction)."""
        rng = np.random.default_rng(31)
        gen.config.speculative_k = 8
        try:
            tpvs = []
            for _ in range(4):
                prompt, _ = self._rag_prompt(corpus, rng)
                prompt = prompt.replace(
                    "\nAnswer:",
                    "\nQuote the most relevant excerpt in your answer."
                    "\nAnswer:")
                gen.generate(prompt, max_tokens=48)
                if gen.last_spec_stats:
                    tpvs.append(gen.last_spec_stats["tokens_per_verify"])
            assert tpvs, "spec path never engaged"
            assert float(np.mean(tpvs)) >= 1.5, tpvs
        finally:
            gen.config.speculative_k = 0
