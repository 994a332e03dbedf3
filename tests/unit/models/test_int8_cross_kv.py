"""int8 cross-attention KV: decoded logits must stay within quantization
tolerance of the bf16 path (the decode loop re-reads the full cross KV
every token; int8 halves that HBM traffic)."""

import jax
import jax.numpy as jnp
import numpy as np

from audio_rag_tpu.models.whisper import (
    WHISPER_PRESETS,
    SpecialTokens,
    decoder_forward,
    encode,
    greedy_decode,
    init_whisper,
    precompute_cross_kv,
    quantize_decoder_weights,
)

DIMS = WHISPER_PRESETS["test"]
ST = SpecialTokens.for_dims(DIMS)


def _setup():
    params = init_whisper(jax.random.PRNGKey(0), DIMS)
    rng = np.random.default_rng(0)
    mel = jnp.asarray(
        rng.standard_normal((2, DIMS.n_mels, 2 * DIMS.n_audio_ctx)),
        jnp.float32)
    enc = encode(params, DIMS, mel, dtype=jnp.float32)
    return params, enc


def test_teacher_forced_logits_close():
    params, enc = _setup()
    toks = jnp.asarray(
        np.random.default_rng(1).integers(0, DIMS.n_vocab - 8, (2, 6)),
        jnp.int32)
    kv = precompute_cross_kv(params, DIMS, enc, jnp.float32)
    kv8 = precompute_cross_kv(params, DIMS, enc, jnp.float32, quantize=True)
    assert kv8[0].dtype == jnp.int8 and len(kv8) == 4
    ref, _, _ = decoder_forward(params, DIMS, toks, kv, dtype=jnp.float32)
    got, _, _ = decoder_forward(params, DIMS, toks, kv8, dtype=jnp.float32)
    ref, got = np.asarray(ref), np.asarray(got)
    denom = np.maximum(np.abs(ref).max(), 1e-9)
    assert np.abs(got - ref).max() / denom < 0.02, (
        "int8 cross-KV logit error exceeds 2% of logit range"
    )


def test_greedy_decode_tokens_match():
    params, enc = _setup()
    prompt = jnp.asarray(np.tile(
        [[ST.sot, ST.lang_base, ST.transcribe, ST.no_timestamps]], (2, 1)
    ).astype(np.int32))
    ref = greedy_decode(params, DIMS, enc, prompt, 8, ST.eot,
                        dtype=jnp.float32, no_speech_id=ST.no_speech)
    got = greedy_decode(params, DIMS, enc, prompt, 8, ST.eot,
                        dtype=jnp.float32, no_speech_id=ST.no_speech,
                        cross_kv_quantize=True)
    np.testing.assert_array_equal(np.asarray(ref[0]), np.asarray(got[0]))
    np.testing.assert_allclose(np.asarray(ref[1]), np.asarray(got[1]),
                               atol=0.05)


def test_greedy_decode_int8_decoder_weights_match():
    """decoder_int8 (int8 weight matmuls in the decode loop) stays within
    quantization tolerance of the full-precision decode: same greedy
    tokens, avg logprob close."""
    params, enc = _setup()
    q8 = quantize_decoder_weights(params, DIMS)
    assert q8["blocks"][0]["mlp_up"]["w8"].dtype == jnp.int8
    assert len(q8["blocks"]) == DIMS.n_text_layer
    prompt = jnp.asarray(np.tile(
        [[ST.sot, ST.lang_base, ST.transcribe, ST.no_timestamps]], (2, 1)
    ).astype(np.int32))
    ref = greedy_decode(params, DIMS, enc, prompt, 8, ST.eot,
                        dtype=jnp.float32, no_speech_id=ST.no_speech,
                        cross_kv_quantize=True)
    got = greedy_decode(params, DIMS, enc, prompt, 8, ST.eot,
                        dtype=jnp.float32, no_speech_id=ST.no_speech,
                        cross_kv_quantize=True, decoder_q8=q8)
    np.testing.assert_array_equal(np.asarray(ref[0]), np.asarray(got[0]))
    np.testing.assert_allclose(np.asarray(ref[1]), np.asarray(got[1]),
                               atol=0.1)
