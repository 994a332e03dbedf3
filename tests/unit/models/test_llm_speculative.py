"""LLM speculative (n-gram-drafted, block-verified) wave decode must
produce EXACTLY ``llm_generate``'s greedy output: greedy verification
accepts a draft token only when it equals the model's own argmax, and the
bonus token IS the argmax (exact at fp32 test dims).

The LLM twin of whisper's speculative decode (VERDICT r2 #4 "same pattern
optionally on the LLM"): small-batch decode is weight-read-bound
(≈2.5 GB/step bf16 on llama-3.2-1b incl. the 128k-vocab lm_head), so
tokens-per-weight-read is the remaining lever after int8. Covers the
paths ``generate_batch`` actually uses: left-padded unequal prompts +
prompt_mask, int8 decode weights, EOS early-exit.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audio_rag_tpu.models.llm import (
    LLM_PRESETS,
    init_llm,
    llm_generate,
    llm_speculative_generate,
    quantize_llm_weights,
)

DIMS = LLM_PRESETS["test"]


@pytest.fixture(scope="module")
def params():
    return init_llm(jax.random.PRNGKey(0), DIMS)


def _prompts(pad_id: int):
    """Left-padded unequal-length prompt batch + mask (the generate_batch
    layout)."""
    rows = [[7, 11, 13, 17, 19, 23], [101, 103, 107], [5]]
    P = 8
    batch = np.full((len(rows), P), pad_id, np.int32)
    mask = np.zeros((len(rows), P), bool)
    for i, r in enumerate(rows):
        batch[i, P - len(r):] = r
        mask[i, P - len(r):] = True
    return jnp.asarray(batch), jnp.asarray(mask)


class TestSpeculativeMatchesGreedy:
    @pytest.mark.parametrize("spec_k", [2, 4, 8])
    def test_tokens_identical(self, params, spec_k):
        eos = 0
        prompt, mask = _prompts(eos)
        ref = llm_generate(
            params, DIMS, prompt, 12, eos_id=eos, temperature=0.0,
            dtype=jnp.float32, prompt_mask=mask,
        )
        got = llm_speculative_generate(
            params, DIMS, prompt, 12, eos_id=eos, spec_k=spec_k,
            dtype=jnp.float32, prompt_mask=mask,
        )
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))

    def test_no_mask_path(self, params):
        eos = 0
        prompt = jnp.array([[3, 1, 4, 1], [5, 9, 2, 6]], jnp.int32)
        ref = llm_generate(
            params, DIMS, prompt, 10, eos_id=eos, temperature=0.0,
            dtype=jnp.float32,
        )
        got = llm_speculative_generate(
            params, DIMS, prompt, 10, eos_id=eos, spec_k=4,
            dtype=jnp.float32,
        )
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))

    def test_int8_weights_matches_int8_greedy(self, params):
        eos = 0
        q8 = quantize_llm_weights(params, DIMS)
        prompt, mask = _prompts(eos)
        ref = llm_generate(
            params, DIMS, prompt, 8, eos_id=eos, temperature=0.0,
            dtype=jnp.float32, prompt_mask=mask, decoder_q8=q8,
        )
        got = llm_speculative_generate(
            params, DIMS, prompt, 8, eos_id=eos, spec_k=4,
            dtype=jnp.float32, prompt_mask=mask, decoder_q8=q8,
        )
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))

    def test_eos_fill_contract(self, params):
        """Positions past each row's EOS hold eos_id (decode-stop rows
        must not keep emitting)."""
        eos = 0
        prompt, mask = _prompts(eos)
        got = np.asarray(llm_speculative_generate(
            params, DIMS, prompt, 12, eos_id=eos, spec_k=4,
            dtype=jnp.float32, prompt_mask=mask,
        ))
        P = prompt.shape[1]
        for row in got:
            gen = row[P:]
            hits = np.nonzero(gen == eos)[0]
            if hits.size:
                assert np.all(gen[hits[0]:] == eos)


def test_backend_speculative_generate_batch():
    """LLMGenerator with generation.speculative_k produces the same texts
    as the plain greedy wave decode (test preset, CPU)."""
    from audio_rag_tpu.config.schema import GenerationConfig
    from audio_rag_tpu.generation.llm_jax import LLMGenerator

    prompts = ["alpha beta gamma", "delta", "epsilon zeta eta theta"]

    def run(spec_k):
        gen = LLMGenerator(GenerationConfig(
            model="test", temperature=0.0, use_scheduler=False,
            speculative_k=spec_k, max_tokens=12,
        ))
        gen.load()
        out = gen.generate_batch(prompts)
        counts = list(gen.last_token_counts)
        gen.unload()
        return out, counts

    assert run(4) == run(0)


class TestSpecStats:
    def test_return_stats_iteration_count(self, params):
        """return_stats exposes the block-verify count: tokens equal the
        plain path's, iterations bound emitted tokens (1..k per verify),
        and acceptance math (emitted-1)/iters stays within [1, k]."""
        eos = 0
        prompt, mask = _prompts(eos)
        ref = np.asarray(llm_speculative_generate(
            params, DIMS, prompt, 12, eos_id=eos, spec_k=4,
            dtype=jnp.float32, prompt_mask=mask,
        ))
        got, iters = llm_speculative_generate(
            params, DIMS, prompt, 12, eos_id=eos, spec_k=4,
            dtype=jnp.float32, prompt_mask=mask, return_stats=True,
        )
        np.testing.assert_array_equal(ref, np.asarray(got))
        n_iter = int(np.asarray(iters))
        assert n_iter >= 1
        P = prompt.shape[1]
        # the longest row emits the most post-prefill tokens; each verify
        # iteration emits between 1 and k of them
        emitted = max(
            int((row[P:] != eos).sum()) for row in np.asarray(got))
        assert n_iter <= 12  # never more iterations than tokens
        assert emitted - 1 <= n_iter * 4
