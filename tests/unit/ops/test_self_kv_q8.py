"""int8 self-KV decode: kernel numerics, cache conversion, greedy parity.

The decode loop's self cache is its largest remaining HBM read once the
cross KV and weights are quantized; ``decode_self_attention_q8`` reads
an int8 cache with PER-POSITION scales through one packed (Cp, 128)
scales+causal-mask operand (no scalar operands — the tile-alignment
lesson). CPU runs the kernel under ``interpret=True``; numerics must
match the dequantized einsum reference exactly up to fp order.
"""

import jax
import jax.numpy as jnp
import numpy as np

from audio_rag_tpu.ops.pallas_kernels import (
    decode_self_attention_q8,
    pack_self_scales,
)

H, HD, CP = 4, 32, 128


def _reference(q, k8, v8, ks, vs, valid):
    """Dequantized fp32 attention over the valid positions."""
    scale = q.shape[-1] ** -0.5
    k = k8.astype(np.float32) * ks[:, :, None, :]  # (B, H, hd, Cp)
    v = v8.astype(np.float32) * vs[:, :, None, :]
    s = np.einsum("bhmd,bhdc->bhmc", q * scale, k)
    s = np.where(valid[:, None, None, :], s, -1e30)
    p = np.exp(s - s.max(-1, keepdims=True))
    p = p / p.sum(-1, keepdims=True)
    return np.einsum("bhmc,bhdc->bhmd", p, v)


def _random_case(rng, B=2, n_valid=37):
    q = rng.standard_normal((B, H, 1, HD)).astype(np.float32)
    k8 = rng.integers(-127, 128, (B, H, HD, CP), dtype=np.int8)
    v8 = rng.integers(-127, 128, (B, H, HD, CP), dtype=np.int8)
    ks = (0.01 + rng.random((B, H, CP))).astype(np.float32)
    vs = (0.01 + rng.random((B, H, CP))).astype(np.float32)
    valid = np.arange(CP) < n_valid
    valid = np.broadcast_to(valid, (B, CP))
    sc = pack_self_scales(jnp.asarray(ks), jnp.asarray(vs),
                          jnp.asarray(valid))
    return q, k8, v8, ks, vs, valid, sc


class TestSelfKernel:
    def test_interpret_matches_dequant_reference(self):
        rng = np.random.default_rng(0)
        q, k8, v8, ks, vs, valid, sc = _random_case(rng)
        got = np.asarray(decode_self_attention_q8(
            jnp.asarray(q), jnp.asarray(k8), jnp.asarray(v8), sc,
            interpret=True))
        ref = _reference(q, k8, v8, ks, vs, valid)
        # scale-after-dot vs dequant-before-dot factorization: same math,
        # fp-order differences only (bounded relative to output scale)
        np.testing.assert_allclose(got, ref,
                                   atol=1e-3 * np.abs(ref).max())

    def test_fallback_path_matches_reference(self):
        """Off-TPU (CPU arrays, no interpret) the dequant-einsum fallback
        runs; same numbers."""
        rng = np.random.default_rng(1)
        q, k8, v8, ks, vs, valid, sc = _random_case(rng, n_valid=5)
        got = np.asarray(decode_self_attention_q8(
            jnp.asarray(q), jnp.asarray(k8), jnp.asarray(v8), sc))
        ref = _reference(q, k8, v8, ks, vs, valid)
        np.testing.assert_allclose(got, ref,
                                   atol=1e-3 * np.abs(ref).max())

    def test_mask_excludes_invalid_positions(self):
        """Garbage past the write head must not leak: perturbing invalid
        positions leaves the output unchanged."""
        rng = np.random.default_rng(2)
        q, k8, v8, ks, vs, valid, sc = _random_case(rng, n_valid=9)
        base = np.asarray(decode_self_attention_q8(
            jnp.asarray(q), jnp.asarray(k8), jnp.asarray(v8), sc,
            interpret=True))
        k8_g = k8.copy()
        v8_g = v8.copy()
        k8_g[:, :, :, 9:] = 77
        v8_g[:, :, :, 9:] = -55
        pert = np.asarray(decode_self_attention_q8(
            jnp.asarray(q), jnp.asarray(k8_g), jnp.asarray(v8_g), sc,
            interpret=True))
        np.testing.assert_array_equal(base, pert)

    def test_pack_layout(self):
        rng = np.random.default_rng(3)
        ks = rng.random((H, CP)).astype(np.float32)
        vs = rng.random((H, CP)).astype(np.float32)
        valid = np.arange(CP) < 11
        sc = np.asarray(pack_self_scales(
            jnp.asarray(ks), jnp.asarray(vs), jnp.asarray(valid)))
        assert sc.shape == (CP, 128)
        np.testing.assert_array_equal(sc[:, :H], ks.T)
        np.testing.assert_array_equal(sc[:, H:2 * H], vs.T)
        np.testing.assert_array_equal(
            sc[:, 2 * H],
            np.where(valid, np.float32(0.0), np.float32(-1e30)))
        assert (sc[:, 2 * H + 1:] == 0).all()


class TestQuantizeSelfCache:
    def test_roundtrip_and_mask(self):
        from audio_rag_tpu.models.whisper import quantize_self_cache

        rng = np.random.default_rng(4)
        L, B, C = 2, 3, 20
        sk = rng.standard_normal((L, B, H, C, HD)).astype(np.float32)
        sv = rng.standard_normal((L, B, H, C, HD)).astype(np.float32)
        k8, v8, sc = quantize_self_cache(
            jnp.asarray(sk), jnp.asarray(sv), 7)
        Cp = 128
        assert k8.shape == (L, B, H, HD, Cp) and k8.dtype == jnp.int8
        assert sc.shape == (L, B, Cp, 128)
        ks = np.asarray(sc)[..., :H].transpose(0, 1, 3, 2)  # (L,B,H,Cp)
        deq = np.asarray(k8).astype(np.float32) * ks[:, :, :, None, :]
        # per-position amax scaling: error ≤ scale/2 = amax/254
        amax = np.abs(sk).max(-1)  # (L, B, H, C)
        err = np.abs(deq[..., :C] - sk.transpose(0, 1, 2, 4, 3))
        assert (err <= amax[:, :, :, None, :] / 127.0 * 0.5 + 1e-7).all()
        # mask: positions < 7 valid, the rest (incl. pad) -1e30
        m = np.asarray(sc)[..., 2 * H]
        assert (m[:, :, :7] == 0).all() and (m[:, :, 7:] == -1e30).all()


class TestGreedySelfKvInt8:
    def test_greedy_matches_bf16_cache(self):
        """Tiny preset, fp32 compute: int8 self-KV greedy must agree with
        the bf16-cache decode (per-position 64-value scale groups keep
        the error far below token decision margins)."""
        from audio_rag_tpu.models.whisper import (
            WHISPER_PRESETS,
            SpecialTokens,
            encode,
            greedy_decode,
            init_whisper,
        )

        dims = WHISPER_PRESETS["test"]
        st = SpecialTokens.for_dims(dims)
        params = init_whisper(jax.random.PRNGKey(0), dims)
        rng = np.random.default_rng(5)
        mel = jnp.asarray(
            rng.standard_normal((2, dims.n_mels, 2 * dims.n_audio_ctx)),
            jnp.float32)
        enc = encode(params, dims, mel, dtype=jnp.float32)
        prompt = jnp.asarray(np.tile(
            [[st.sot, st.lang_base, st.transcribe, st.no_timestamps]],
            (2, 1)).astype(np.int32))
        ref = greedy_decode(params, dims, enc, prompt, 10, st.eot,
                            dtype=jnp.float32, no_speech_id=st.no_speech)
        got = greedy_decode(params, dims, enc, prompt, 10, st.eot,
                            dtype=jnp.float32, no_speech_id=st.no_speech,
                            self_kv_int8=True)
        np.testing.assert_array_equal(np.asarray(ref[0]),
                                      np.asarray(got[0]))
        np.testing.assert_allclose(np.asarray(ref[1]), np.asarray(got[1]),
                                   atol=0.05)

    def test_composes_with_other_quant_paths(self):
        from audio_rag_tpu.models.whisper import (
            WHISPER_PRESETS,
            SpecialTokens,
            encode,
            greedy_decode,
            init_whisper,
            quantize_decoder_weights,
        )

        dims = WHISPER_PRESETS["test"]
        st = SpecialTokens.for_dims(dims)
        params = init_whisper(jax.random.PRNGKey(1), dims)
        rng = np.random.default_rng(6)
        mel = jnp.asarray(
            rng.standard_normal((2, dims.n_mels, 2 * dims.n_audio_ctx)),
            jnp.float32)
        enc = encode(params, dims, mel, dtype=jnp.float32)
        q8 = quantize_decoder_weights(params, dims)
        prompt = jnp.asarray(np.tile(
            [[st.sot, st.lang_base, st.transcribe, st.no_timestamps]],
            (2, 1)).astype(np.int32))
        ref = greedy_decode(params, dims, enc, prompt, 8, st.eot,
                            dtype=jnp.float32, no_speech_id=st.no_speech,
                            cross_kv_quantize=True, decoder_q8=q8)
        got = greedy_decode(params, dims, enc, prompt, 8, st.eot,
                            dtype=jnp.float32, no_speech_id=st.no_speech,
                            cross_kv_quantize=True, decoder_q8=q8,
                            self_kv_int8=True)
        agree = (np.asarray(ref[0]) == np.asarray(got[0])).mean()
        assert agree >= 0.8, agree

    def test_backend_wiring(self):
        from audio_rag_tpu.asr.whisper_jax import WhisperJaxASR
        from audio_rag_tpu.config.schema import ASRConfig

        asr = WhisperJaxASR(ASRConfig(
            model_size="test", compute_type="float32", vad_filter=False,
            self_kv_int8=True))
        assert asr._self_kv_int8
        asr.load()
        try:
            audio = (0.2 * np.random.default_rng(7)
                     .standard_normal(16000)).astype(np.float32)
            segs = asr.transcribe(audio, 16000)
            assert isinstance(segs, list)
        finally:
            asr.unload()
