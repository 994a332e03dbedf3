"""int4 cross-attention KV (``cross_kv_int4``): quarter-width cross-KV
reads with per-channel scales and in-VMEM nibble unpack
(``ops/pallas_kernels.decode_cross_attention_q4``).

With int8 weights the cross-KV read is ~2/3 of the whisper decode step's
HBM traffic, so int4 KV is the largest remaining per-step lever. CPU
runs the kernel under ``interpret=True``; the einsum fallback
(``models/whisper._unpack_kv4`` + scale folds) defines the same math.
"""

import jax
import jax.numpy as jnp
import numpy as np

from audio_rag_tpu.models.whisper import (
    WHISPER_PRESETS,
    SpecialTokens,
    _unpack_kv4,
    decoder_forward,
    encode,
    greedy_decode,
    init_whisper,
    precompute_cross_kv,
)
from audio_rag_tpu.ops.pallas_kernels import (
    decode_cross_attention_q4,
    decode_cross_attention_q8,
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


class TestQuant4Packing:
    def test_pack_unpack_roundtrip_and_shapes(self):
        params, enc = _setup()
        hd = DIMS.n_text_state // DIMS.n_text_head
        k, v = precompute_cross_kv(params, DIMS, enc, jnp.float32)
        k4, v4, ks, vs = precompute_cross_kv(
            params, DIMS, enc, jnp.float32, quantize=True, bits=4)
        L, B, H = DIMS.n_text_layer, 2, DIMS.n_text_head
        Ta = k.shape[3]
        assert k4.shape == (L, B, H, hd // 2, Ta)
        assert ks.shape == (L, B, H, 1, hd)       # per-CHANNEL scales
        unpacked = np.asarray(_unpack_kv4(k4), np.float32)  # (L,B,H,hd,Ta)
        assert unpacked.min() >= -7 and unpacked.max() <= 7
        # dequant ≈ original within half a step per channel
        deq = unpacked * np.asarray(ks).transpose(0, 1, 2, 4, 3)
        ref = np.asarray(k).transpose(0, 1, 2, 4, 3)  # (L,B,H,hd,Ta)
        step = np.asarray(ks).transpose(0, 1, 2, 4, 3)
        assert np.all(np.abs(deq - ref) <= 0.5 * step + 1e-6)

    def test_int4_rejects_bad_bits(self):
        import pytest

        params, enc = _setup()
        with pytest.raises(ValueError):
            precompute_cross_kv(params, DIMS, enc, jnp.float32,
                                quantize=True, bits=2)


class TestKernelParity:
    def test_q4_kernel_matches_einsum_fallback(self):
        """Interpret-mode kernel vs the dequant-einsum on production-like
        shapes (H=20, hd=64, Ta=512): identical math, f32 tolerance."""
        rng = np.random.default_rng(3)
        B, H, M, hd, Ta = 2, 20, 1, 64, 512
        q = jnp.asarray(rng.standard_normal((B, H, M, hd)), jnp.float32)
        kf = rng.standard_normal((B, H, Ta, hd)).astype(np.float32)
        vf = rng.standard_normal((B, H, Ta, hd)).astype(np.float32)

        def quant4(x):  # mirror precompute_cross_kv.quant4, no L axis
            amax = np.abs(x).max(axis=2, keepdims=True)
            s = np.maximum(amax, 1e-9) / 7.0
            qx = np.clip(np.round(x / s), -7, 7).astype(np.int8)
            qt = qx.transpose(0, 1, 3, 2)  # (B,H,hd,Ta)
            packed = (qt[:, :, :hd // 2] & np.int8(0x0F)) \
                | (qt[:, :, hd // 2:] << 4)
            return (jnp.asarray(packed.astype(np.int8)),
                    jnp.asarray(s, jnp.float32))

        k4, ks = quant4(kf)
        v4, vs = quant4(vf)
        got = np.asarray(decode_cross_attention_q4(
            q, k4, v4, ks, vs, interpret=True))

        # reference: unpacked ints through the q8 kernel contract — fold
        # per-channel K scales into q, V scales into the output
        ku = np.asarray(_unpack_kv4(k4), np.float32)  # (B,H,hd,Ta)
        vu = np.asarray(_unpack_kv4(v4), np.float32)
        qs = np.asarray(q) * np.asarray(ks) * hd ** -0.5
        s = np.einsum("bhmd,bhdt->bhmt", qs, ku)
        p = np.exp(s - s.max(-1, keepdims=True))
        p /= p.sum(-1, keepdims=True)
        ref = np.einsum("bhmt,bhdt->bhmd", p, vu) * np.asarray(vs)
        np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)

    def test_q4_beam_m_dim(self):
        """M>1 (beam queries sharing a row's KV) rides the same kernel."""
        rng = np.random.default_rng(4)
        B, H, M, hd, Ta = 2, 8, 4, 64, 256
        q = jnp.asarray(rng.standard_normal((B, H, M, hd)), jnp.float32)
        k4 = jnp.asarray(
            rng.integers(-128, 128, (B, H, hd // 2, Ta)), jnp.int8)
        v4 = jnp.asarray(
            rng.integers(-128, 128, (B, H, hd // 2, Ta)), jnp.int8)
        ks = jnp.asarray(rng.uniform(0.01, 0.1, (B, H, 1, hd)), jnp.float32)
        vs = jnp.asarray(rng.uniform(0.01, 0.1, (B, H, 1, hd)), jnp.float32)
        got = np.asarray(decode_cross_attention_q4(
            q, k4, v4, ks, vs, interpret=True))
        assert got.shape == (B, H, M, hd)
        # each M row is an independent query — M=1 slices must agree
        for m in range(M):
            one = np.asarray(decode_cross_attention_q4(
                q[:, :, m:m + 1], k4, v4, ks, vs, interpret=True))
            np.testing.assert_allclose(got[:, :, m:m + 1], one,
                                       rtol=1e-5, atol=1e-5)


class TestDecodeParity:
    def test_teacher_forced_logits_close(self):
        """int4 cross-KV logit error stays bounded — ~4× int8's 2% bound
        at the same per-head granularity would be ~8%, but the
        per-CHANNEL scales claw most of that back."""
        params, enc = _setup()
        toks = jnp.asarray(
            np.random.default_rng(1).integers(0, DIMS.n_vocab - 8, (2, 6)),
            jnp.int32)
        kv = precompute_cross_kv(params, DIMS, enc, jnp.float32)
        kv4 = precompute_cross_kv(params, DIMS, enc, jnp.float32,
                                  quantize=True, bits=4)
        assert kv4[0].dtype == jnp.int8 and len(kv4) == 4
        ref, _, _ = decoder_forward(params, DIMS, toks, kv,
                                    dtype=jnp.float32)
        got, _, _ = decoder_forward(params, DIMS, toks, kv4,
                                    dtype=jnp.float32)
        ref, got = np.asarray(ref), np.asarray(got)
        denom = np.maximum(np.abs(ref).max(), 1e-9)
        assert np.abs(got - ref).max() / denom < 0.06, (
            "int4 cross-KV logit error exceeds 6% of logit range")

    def test_greedy_decode_runs_and_logprob_close(self):
        params, enc = _setup()
        prompt = jnp.asarray(np.tile(
            [[ST.sot, ST.lang_base, ST.transcribe, ST.no_timestamps]],
            (2, 1)).astype(np.int32))
        ref = greedy_decode(params, DIMS, enc, prompt, 8, ST.eot,
                            dtype=jnp.float32, no_speech_id=ST.no_speech)
        got = greedy_decode(params, DIMS, enc, prompt, 8, ST.eot,
                            dtype=jnp.float32, no_speech_id=ST.no_speech,
                            cross_kv_quantize=True, cross_kv_bits=4)
        assert np.asarray(got[0]).shape == np.asarray(ref[0]).shape
        np.testing.assert_allclose(np.asarray(ref[1]), np.asarray(got[1]),
                                   atol=0.3)


class TestBackendWiring:
    def test_int4_takes_precedence_and_keys_programs(self):
        from audio_rag_tpu.asr.whisper_jax import WhisperJaxASR
        from audio_rag_tpu.config.schema import ASRConfig

        a = WhisperJaxASR(ASRConfig(model_size="test", cross_kv_int8=True,
                                    cross_kv_int4=True))
        assert a._cross_kv_bits == 4
        b = WhisperJaxASR(ASRConfig(model_size="test", cross_kv_int8=True))
        assert b._cross_kv_bits == 8
        c = WhisperJaxASR(ASRConfig(model_size="test"))
        assert c._cross_kv_bits == 0
