"""Whisper architecture tests on the tiny 'test' preset (CPU, fast).

The key invariant: incremental KV-cached decoding must produce exactly the
tokens a teacher-forced full forward would pick — this validates the cache
index/mask machinery that the real model depends on.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audio_rag_tpu.models.whisper import (
    WHISPER_PRESETS,
    SpecialTokens,
    decoder_forward,
    encode,
    greedy_decode,
    init_whisper,
    precompute_cross_kv,
)

DIMS = WHISPER_PRESETS["test"]


@pytest.fixture(scope="module")
def params():
    return init_whisper(jax.random.PRNGKey(0), DIMS)


@pytest.fixture(scope="module")
def mel():
    rng = np.random.default_rng(0)
    # (B, n_mels, 2*n_audio_ctx)
    return jnp.asarray(
        rng.standard_normal((2, DIMS.n_mels, 2 * DIMS.n_audio_ctx)), jnp.float32
    )


class TestInit:
    def test_storage_dtype_init_matches_cast(self, params):
        """The memory-bounded scan init (storage_dtype=bf16) must equal
        casting the eager fp32 init up to 1 bf16 ULP (XLA may fuse
        ``normal * scale`` into the cast under jit, double-rounding
        boundary cases)."""
        scanned = jax.jit(
            lambda k: init_whisper(k, DIMS, storage_dtype=jnp.bfloat16)
        )(jax.random.PRNGKey(0))
        ref = jax.tree.map(
            lambda x: x.astype(jnp.bfloat16)
            if x.dtype == jnp.float32 else x, params)
        for a, b in zip(jax.tree.leaves(scanned), jax.tree.leaves(ref)):
            assert a.dtype == b.dtype
            np.testing.assert_allclose(
                np.asarray(a, np.float32), np.asarray(b, np.float32),
                rtol=1e-2, atol=1e-4,
            )


class TestEncoder:
    def test_shapes(self, params, mel):
        enc = encode(params, DIMS, mel, dtype=jnp.float32)
        assert enc.shape == (2, DIMS.n_audio_ctx, DIMS.n_audio_state)
        assert bool(jnp.all(jnp.isfinite(enc)))

    def test_deterministic(self, params, mel):
        e1 = encode(params, DIMS, mel, dtype=jnp.float32)
        e2 = encode(params, DIMS, mel, dtype=jnp.float32)
        np.testing.assert_array_equal(np.asarray(e1), np.asarray(e2))


class TestDecoder:
    def test_teacher_forced_shapes(self, params, mel):
        enc = encode(params, DIMS, mel, dtype=jnp.float32)
        ckv = precompute_cross_kv(params, DIMS, enc, dtype=jnp.float32)
        tokens = jnp.array([[1, 2, 3, 4], [1, 2, 3, 4]], jnp.int32)
        logits, cache, w = decoder_forward(
            params, DIMS, tokens, ckv, dtype=jnp.float32
        )
        assert logits.shape == (2, 4, DIMS.n_vocab)
        assert cache is None and w is None

    def test_cross_weights_collected(self, params, mel):
        enc = encode(params, DIMS, mel[:1], dtype=jnp.float32)
        ckv = precompute_cross_kv(params, DIMS, enc, dtype=jnp.float32)
        tokens = jnp.array([[1, 2, 3]], jnp.int32)
        _, _, w = decoder_forward(
            params, DIMS, tokens, ckv, dtype=jnp.float32,
            collect_cross_weights=True,
        )
        # (L, B, H, T, Ta)
        assert w.shape == (
            DIMS.n_text_layer, 1, DIMS.n_text_head, 3, DIMS.n_audio_ctx
        )
        np.testing.assert_allclose(
            np.asarray(w.sum(axis=-1)), 1.0, atol=1e-5
        )
        # the scan-carry "alignment_mean" mode must equal reducing the raw
        # stack (upper-half layers, head-averaged) — it exists because the
        # raw (L, B, H, T, Ta) stack is ~70 GB at production window batch
        _, _, wm = decoder_forward(
            params, DIMS, tokens, ckv, dtype=jnp.float32,
            collect_cross_weights="alignment_mean",
        )
        L = DIMS.n_text_layer
        ref = np.asarray(w)[L // 2:].mean(axis=(0, 2))
        np.testing.assert_allclose(np.asarray(wm), ref, atol=1e-5)

    def test_incremental_matches_teacher_forced(self, params, mel):
        """KV-cached step-by-step logits == full forward logits."""
        enc = encode(params, DIMS, mel[:1], dtype=jnp.float32)
        ckv = precompute_cross_kv(params, DIMS, enc, dtype=jnp.float32)
        tokens = jnp.array([[1, 9, 17, 25, 3]], jnp.int32)
        full_logits, _, _ = decoder_forward(
            params, DIMS, tokens, ckv, dtype=jnp.float32
        )

        L, H = DIMS.n_text_layer, DIMS.n_text_head
        hd = DIMS.n_text_state // H
        sk = jnp.zeros((L, 1, H, tokens.shape[1], hd), jnp.float32)
        sv = jnp.zeros_like(sk)
        step_logits = []
        cache = (sk, sv)
        for i in range(tokens.shape[1]):
            lg, cache, _ = decoder_forward(
                params, DIMS, tokens[:, i : i + 1], ckv,
                pos_offset=i, self_cache=cache, dtype=jnp.float32,
            )
            step_logits.append(np.asarray(lg[0, 0]))
        np.testing.assert_allclose(
            np.stack(step_logits), np.asarray(full_logits[0]),
            atol=2e-4, rtol=1e-4,
        )


class TestGreedyDecode:
    def test_decode_runs_and_is_deterministic(self, params, mel):
        st = SpecialTokens.for_dims(DIMS)
        enc = encode(params, DIMS, mel, dtype=jnp.float32)
        prompt = jnp.array(
            [[st.sot, st.lang_base, st.transcribe, st.no_timestamps]] * 2,
            jnp.int32,
        )
        out1, lp1, ns1 = greedy_decode(params, DIMS, enc, prompt, 8,
                                       st.eot, dtype=jnp.float32)
        out2, lp2, _ = greedy_decode(params, DIMS, enc, prompt, 8,
                                     st.eot, dtype=jnp.float32)
        assert lp1.shape == (2,) and ns1.shape == (2,)
        assert (np.asarray(lp1) <= 0).all()
        np.testing.assert_array_equal(np.asarray(lp1), np.asarray(lp2))
        assert out1.shape == (2, prompt.shape[1] + 8)
        np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))

    def test_decode_matches_teacher_forced_argmax(self, params, mel):
        """Greedy output token i+1 = argmax of teacher-forced logits at i."""
        st = SpecialTokens.for_dims(DIMS)
        enc = encode(params, DIMS, mel[:1], dtype=jnp.float32)
        prompt = jnp.array(
            [[st.sot, st.lang_base, st.transcribe, st.no_timestamps]],
            jnp.int32,
        )
        out, _, _ = greedy_decode(params, DIMS, enc, prompt, 6, st.eot,
                                  dtype=jnp.float32)
        ckv = precompute_cross_kv(params, DIMS, enc, dtype=jnp.float32)
        # replay the decoded sequence teacher-forced; drop positions after EOT
        seq = np.asarray(out[0])
        tf_logits, _, _ = decoder_forward(
            params, DIMS, out[:, :-1], ckv, dtype=jnp.float32
        )
        P = prompt.shape[1]
        done = False
        for i in range(P - 1, out.shape[1] - 1):
            if done:
                break
            expected = int(np.argmax(np.asarray(tf_logits[0, i])))
            assert int(seq[i + 1]) == expected
            if expected == st.eot:
                done = True
