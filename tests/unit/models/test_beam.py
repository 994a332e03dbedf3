import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audio_rag_tpu.models.whisper import (
    WHISPER_PRESETS,
    SpecialTokens,
    beam_decode,
    decoder_forward,
    encode,
    greedy_decode,
    init_whisper,
    precompute_cross_kv,
)

DIMS = WHISPER_PRESETS["test"]
ST = SpecialTokens.for_dims(DIMS)


@pytest.fixture(scope="module")
def setup():
    params = init_whisper(jax.random.PRNGKey(0), DIMS)
    rng = np.random.default_rng(0)
    mel = jnp.asarray(
        rng.standard_normal((2, DIMS.n_mels, 2 * DIMS.n_audio_ctx)),
        jnp.float32,
    )
    enc = encode(params, DIMS, mel, dtype=jnp.float32)
    prompt = jnp.array(
        [[ST.sot, ST.lang_base, ST.transcribe, ST.no_timestamps]] * 2,
        jnp.int32,
    )
    return params, enc, prompt


class TestBeamDecode:
    def test_shapes_and_determinism(self, setup):
        params, enc, prompt = setup
        o1 = beam_decode(params, DIMS, enc, prompt, 6, ST.eot,
                         beam_size=3, dtype=jnp.float32)
        o2 = beam_decode(params, DIMS, enc, prompt, 6, ST.eot,
                         beam_size=3, dtype=jnp.float32)
        assert o1.shape == (2, prompt.shape[1] + 6)
        np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))

    def test_beam1_matches_greedy(self, setup):
        """beam_size=1 must reduce exactly to greedy decoding."""
        params, enc, prompt = setup
        beam = beam_decode(params, DIMS, enc, prompt, 6, ST.eot,
                           beam_size=1, dtype=jnp.float32)
        greedy, _, _ = greedy_decode(params, DIMS, enc, prompt, 6, ST.eot,
                                     dtype=jnp.float32)
        np.testing.assert_array_equal(np.asarray(beam), np.asarray(greedy))

    def test_beam_int8_cross_kv_matches_bf16(self, setup):
        """cross_kv_quantize beam must pick the same tokens as the float
        path at test dims (int8 logit error ≪ token decision margins)."""
        params, enc, prompt = setup
        ref = beam_decode(params, DIMS, enc, prompt, 6, ST.eot,
                          beam_size=3, dtype=jnp.float32)
        got = beam_decode(params, DIMS, enc, prompt, 6, ST.eot,
                          beam_size=3, dtype=jnp.float32,
                          cross_kv_quantize=True)
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))

    def test_beam_int8_weights_runs(self, setup):
        """decoder_q8 beam path (int8 weight matmuls) stays numerically
        close: token agreement on the winner hypothesis."""
        from audio_rag_tpu.models.whisper import quantize_decoder_weights

        params, enc, prompt = setup
        q8 = quantize_decoder_weights(params, DIMS)
        ref = beam_decode(params, DIMS, enc, prompt, 5, ST.eot,
                          beam_size=2, dtype=jnp.float32)
        got = beam_decode(params, DIMS, enc, prompt, 5, ST.eot,
                          beam_size=2, dtype=jnp.float32, decoder_q8=q8)
        assert got.shape == ref.shape
        # int8 weights perturb logits slightly; demand ≥60% token overlap
        agree = (np.asarray(ref) == np.asarray(got)).mean()
        assert agree >= 0.6

    def test_beam_sequence_logprob_not_worse_than_greedy(self, setup):
        """The beam winner's total logprob must be >= greedy's (that's the
        point of beam search)."""
        params, enc, prompt = setup

        def seq_logprob(tokens):
            ckv = precompute_cross_kv(params, DIMS, enc, jnp.float32)
            logits, _, _ = decoder_forward(
                params, DIMS, tokens[:, :-1], ckv, dtype=jnp.float32
            )
            logp = jax.nn.log_softmax(logits, axis=-1)
            P = prompt.shape[1]
            total = 0.0
            for b in range(tokens.shape[0]):
                for i in range(P - 1, tokens.shape[1] - 1):
                    tid = int(tokens[b, i + 1])
                    total += float(logp[b, i, tid])
                    if tid == ST.eot:
                        break
            return total

        beam = beam_decode(params, DIMS, enc, prompt, 5, ST.eot,
                           beam_size=4, dtype=jnp.float32)
        greedy, _, _ = greedy_decode(params, DIMS, enc, prompt, 5, ST.eot,
                                     dtype=jnp.float32)
        assert seq_logprob(np.asarray(beam)) >= \
            seq_logprob(np.asarray(greedy)) - 1e-3


class TestLazyAncestryBeam:
    """``reorder="lazy"``: no physical cache reorder — birth-order
    (L, B, H, K, C, hd) caches + an ancestry mask select each beam's
    history inside the masked all-pairs self-attention. Must reproduce
    the one-hot (physically reordered) decode exactly up to fp
    reduction order."""

    def test_lazy_matches_onehot(self, setup):
        params, enc, prompt = setup
        ref = beam_decode(params, DIMS, enc, prompt, 8, ST.eot,
                          beam_size=3, dtype=jnp.float32,
                          reorder="onehot")
        got = beam_decode(params, DIMS, enc, prompt, 8, ST.eot,
                          beam_size=3, dtype=jnp.float32,
                          reorder="lazy")
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))

    def test_lazy_matches_onehot_beam5_long(self, setup):
        """Wider beam + longer horizon: more hypothesis reorders, so a
        wrong ancestry permutation would diverge here."""
        params, enc, prompt = setup
        ref = beam_decode(params, DIMS, enc, prompt, 16, ST.eot,
                          beam_size=5, dtype=jnp.float32,
                          reorder="onehot")
        got = beam_decode(params, DIMS, enc, prompt, 16, ST.eot,
                          beam_size=5, dtype=jnp.float32,
                          reorder="lazy")
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))

    def test_lazy_beam1_matches_greedy(self, setup):
        params, enc, prompt = setup
        beam = beam_decode(params, DIMS, enc, prompt, 6, ST.eot,
                           beam_size=1, dtype=jnp.float32,
                           reorder="lazy")
        greedy, _, _ = greedy_decode(params, DIMS, enc, prompt, 6, ST.eot,
                                     dtype=jnp.float32)
        np.testing.assert_array_equal(np.asarray(beam), np.asarray(greedy))

    def test_lazy_quantized_paths(self, setup):
        """lazy × (int8 cross KV, int8 decoder weights) compose: same
        selections as the equivalently-quantized one-hot decode."""
        from audio_rag_tpu.models.whisper import quantize_decoder_weights

        params, enc, prompt = setup
        q8 = quantize_decoder_weights(params, DIMS)
        for kwargs in ({"cross_kv_quantize": True}, {"decoder_q8": q8}):
            ref = beam_decode(params, DIMS, enc, prompt, 6, ST.eot,
                              beam_size=3, dtype=jnp.float32,
                              reorder="onehot", **kwargs)
            got = beam_decode(params, DIMS, enc, prompt, 6, ST.eot,
                              beam_size=3, dtype=jnp.float32,
                              reorder="lazy", **kwargs)
            np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))

    def test_unknown_mode_raises(self, setup):
        params, enc, prompt = setup
        with pytest.raises(ValueError, match="reorder"):
            beam_decode(params, DIMS, enc, prompt, 4, ST.eot,
                        beam_size=2, dtype=jnp.float32, reorder="nope")
