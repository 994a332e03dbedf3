"""Speculative (n-gram-drafted, block-verified) decode must produce
EXACTLY the plain greedy decode's output: greedy verification accepts a
draft token only when it equals the model's own argmax, and the bonus
token IS the argmax — so the token stream, avg-logprob accounting, and
no-speech probability are all identical (up to fp associativity; exact at
fp32 test dims).

Matches reference hot loop #1 (``asr/whisper.py:120-126``): the decode
loop is memory-bound one-token-at-a-time; block verification is the
tokens-per-HBM-read lever (VERDICT r2 #4).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audio_rag_tpu.models.whisper import (
    WHISPER_PRESETS,
    SpecialTokens,
    encode,
    greedy_decode,
    init_whisper,
    ngram_draft,
    quantize_decoder_weights,
    speculative_greedy_decode,
)

DIMS = WHISPER_PRESETS["test"]
ST = SpecialTokens.for_dims(DIMS)


@pytest.fixture(scope="module")
def setup():
    params = init_whisper(jax.random.PRNGKey(0), DIMS)
    rng = np.random.default_rng(0)
    mel = jnp.asarray(
        rng.standard_normal((3, DIMS.n_mels, 2 * DIMS.n_audio_ctx)),
        jnp.float32,
    )
    enc = encode(params, DIMS, mel, dtype=jnp.float32)
    prompt = jnp.array(
        [[ST.sot, ST.lang_base, ST.transcribe, ST.no_timestamps]] * 3,
        jnp.int32,
    )
    return params, enc, prompt


class TestNgramDraft:
    def test_copies_after_latest_2gram_match(self):
        # history: 5 6 7 8 5 6 | last 2-gram (5, 6) matched at pos 0 →
        # drafts copy tokens[2:] = 7 8
        toks = jnp.array([[5, 6, 7, 8, 5, 6, 0, 0]], jnp.int32)
        d = ngram_draft(toks, jnp.array([5]), 2)
        np.testing.assert_array_equal(np.asarray(d), [[7, 8]])

    def test_no_match_repeats_last(self):
        toks = jnp.array([[1, 2, 3, 4, 5, 0, 0, 0]], jnp.int32)
        d = ngram_draft(toks, jnp.array([4]), 3)
        np.testing.assert_array_equal(np.asarray(d), [[5, 5, 5]])

    def test_prefers_most_recent_match(self):
        # (9, 9) occurs at 0 (→ next 1) and at 3 (→ next 2): take pos 3
        toks = jnp.array([[9, 9, 1, 9, 9, 2, 9, 9, 0]], jnp.int32)
        d = ngram_draft(toks, jnp.array([7]), 1)
        np.testing.assert_array_equal(np.asarray(d), [[2]])


class TestSpeculativeMatchesGreedy:
    @pytest.mark.parametrize("spec_k", [2, 4, 8])
    def test_tokens_identical(self, setup, spec_k):
        params, enc, prompt = setup
        ref_t, ref_lp, ref_ns = greedy_decode(
            params, DIMS, enc, prompt, 10, ST.eot, dtype=jnp.float32,
            no_speech_id=ST.no_speech,
        )
        got_t, got_lp, got_ns = speculative_greedy_decode(
            params, DIMS, enc, prompt, 10, ST.eot, spec_k=spec_k,
            dtype=jnp.float32, no_speech_id=ST.no_speech,
        )
        np.testing.assert_array_equal(np.asarray(ref_t), np.asarray(got_t))
        np.testing.assert_allclose(np.asarray(ref_lp), np.asarray(got_lp),
                                   atol=1e-4)
        np.testing.assert_allclose(np.asarray(ref_ns), np.asarray(got_ns),
                                   atol=1e-6)

    def test_int8_cross_kv_matches_int8_greedy(self, setup):
        params, enc, prompt = setup
        ref_t, _, _ = greedy_decode(
            params, DIMS, enc, prompt, 8, ST.eot, dtype=jnp.float32,
            cross_kv_quantize=True,
        )
        got_t, _, _ = speculative_greedy_decode(
            params, DIMS, enc, prompt, 8, ST.eot, spec_k=4,
            dtype=jnp.float32, cross_kv_quantize=True,
        )
        np.testing.assert_array_equal(np.asarray(ref_t), np.asarray(got_t))

    def test_int8_weights_matches_int8_greedy(self, setup):
        params, enc, prompt = setup
        q8 = quantize_decoder_weights(params, DIMS)
        ref_t, _, _ = greedy_decode(
            params, DIMS, enc, prompt, 8, ST.eot, dtype=jnp.float32,
            decoder_q8=q8,
        )
        got_t, _, _ = speculative_greedy_decode(
            params, DIMS, enc, prompt, 8, ST.eot, spec_k=4,
            dtype=jnp.float32, decoder_q8=q8,
        )
        np.testing.assert_array_equal(np.asarray(ref_t), np.asarray(got_t))


def test_backend_speculative_transcribe():
    """WhisperJaxASR with speculative_k produces the same segments as the
    plain greedy backend (test preset, CPU)."""
    from audio_rag_tpu.asr.whisper_jax import WhisperJaxASR
    from audio_rag_tpu.config.schema import ASRConfig

    sr = 16000
    rng = np.random.default_rng(0)
    audio = (0.05 * rng.standard_normal(sr * 2)).astype(np.float32)

    def run(spec_k):
        # float32 compute: random-init logits are near-uniform, and the
        # top-2 margin at some steps (~1.5e-3 logprob, measured) is below
        # bf16 resolution — under bf16 the argmax between block-verify
        # and step decode becomes a rounding coin-flip that even thread-
        # pool state can tip (the divergence reproduced only after other
        # tests warmed the XLA:CPU thread pool). fp32 noise (~1e-5) sits
        # two orders below the margin, making parity deterministic.
        asr = WhisperJaxASR(ASRConfig(
            model_size="test", vad_filter=False, compute_type="float32",
            temperature_fallback=False, speculative_k=spec_k,
        ))
        asr.load()
        segs = asr.transcribe(audio, sr)
        asr.unload()
        return [(s.text, s.start, s.end) for s in segs]

    assert run(4) == run(0)
