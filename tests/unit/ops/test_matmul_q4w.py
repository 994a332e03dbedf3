"""int4-weight matmul kernel (``ops/pallas_kernels.matmul_q4w``): the
decode loops' weight matmuls at a quarter of the bf16 HBM width — the
weight regime the reference itself serves (ollama Q4_K_M) — with
group-wise scales and in-VMEM dequant.

CPU runs the kernel under ``interpret=True``; the fallback einsum
(``models/layers._dequant_q4``) defines the same math, so kernel and
fallback must agree to f32 rounding. Decode-parity tests run the tiny
presets through the fallback path (dims not kernel-tileable), which is
exactly what the product code does off-TPU.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audio_rag_tpu.models.layers import (
    _dequant_q4,
    linear_q8,
    quantize_linear_q4,
)
from audio_rag_tpu.ops.pallas_kernels import matmul_q4w, q4_group, q4_tiles


class TestTileChooser:
    def test_known_model_dims_are_tileable(self):
        # whisper large-v3 (1280/5120), llama-3.2-3b (3072/8192), 1b (2048)
        for din in (1280, 5120, 3072, 8192, 2048):
            tiles = q4_tiles(din)
            assert tiles is not None, din
            group, din_t = tiles
            assert group <= 128 and din_t % 256 == 0
            assert din % din_t == 0 and din_t % group == 0
            assert (din_t // 2) % 128 == 0      # x-halves lane tiling
            assert (din_t // group) % 8 == 0    # f32 scale sublane tiling
            assert q4_group(din) == group

    def test_tiny_dims_fall_back_to_divisor_group(self):
        assert q4_tiles(64) is None
        assert q4_group(64) == 64
        assert q4_group(48) == 48
        with pytest.raises(ValueError):
            q4_group(63)  # odd din can't nibble-pack


class TestQuantize:
    def test_roundtrip_error_bounded_per_group(self):
        rng = np.random.default_rng(1)
        w = rng.standard_normal((256, 96)).astype(np.float32) * 0.3
        p4 = quantize_linear_q4(jnp.asarray(w))
        group = 256 // p4["s"].shape[0]
        back = np.asarray(_dequant_q4(p4))
        # symmetric 4-bit at group amax: error ≤ half a step, plus the
        # bf16 rounding of the scale itself (≤0.4% relative × |q|≤7)
        step = np.repeat(np.asarray(p4["s"]), group, axis=0)
        assert np.all(np.abs(back - w) <= 0.53 * step + 1e-7)

    def test_packing_layout(self):
        """Byte r holds din rows 2r (low nibble) / 2r+1 (high nibble)."""
        w = jnp.zeros((4, 2), jnp.float32)
        w = w.at[0, 0].set(7.0).at[1, 0].set(-7.0).at[2, 1].set(3.0)
        p4 = quantize_linear_q4(w)
        packed = np.asarray(p4["w4"], np.uint8)
        assert packed.shape == (2, 2)
        assert packed[0, 0] & 0x0F == 7          # row 0 → low nibble
        assert packed[0, 0] >> 4 == 0x09         # row 1 = -7 → high nibble
        back = np.asarray(_dequant_q4(p4))
        np.testing.assert_allclose(back, np.asarray(w), rtol=2e-2)


@pytest.mark.parametrize("B,din,dout", [
    (16, 1280, 1280),   # whisper large-v3 attention projection
    (16, 512, 256),
    (32, 2048, 640),    # dout needs a non-cap divisor tile
])
def test_kernel_matches_dequant_reference(B, din, dout):
    rng = np.random.default_rng(0)
    w = rng.standard_normal((din, dout)).astype(np.float32) * 0.05
    p4 = quantize_linear_q4(jnp.asarray(w))
    x = rng.standard_normal((B, din)).astype(np.float32)
    got = np.asarray(matmul_q4w(
        jnp.asarray(x, jnp.bfloat16), p4["w4"], p4["s"], interpret=True))
    ref = np.asarray(jnp.dot(
        jnp.asarray(x).astype(jnp.bfloat16).astype(jnp.float32),
        _dequant_q4(p4), preferred_element_type=jnp.float32))
    np.testing.assert_allclose(
        got, ref, rtol=2e-5, atol=2e-5 * np.abs(ref).max())


def test_kernel_rejects_mismatched_group():
    rng = np.random.default_rng(3)
    p4 = quantize_linear_q4(jnp.asarray(
        rng.standard_normal((512, 128)).astype(np.float32)))
    bad_s = jnp.concatenate([p4["s"], p4["s"]])  # wrong group size
    with pytest.raises(ValueError):
        matmul_q4w(jnp.ones((16, 512), jnp.bfloat16), p4["w4"], bad_s,
                   interpret=True)


def test_linear_q8_routes_w4_fallback_and_bias():
    """Misaligned dims (tiny test models) take the dequant-einsum path,
    keyed off the 'w4' key, and still add the bias from the fp params."""
    rng = np.random.default_rng(2)
    w = rng.standard_normal((48, 40)).astype(np.float32) * 0.2
    b = rng.standard_normal((40,)).astype(np.float32)
    x = rng.standard_normal((2, 3, 48)).astype(np.float32)
    p = {"w": jnp.asarray(w), "b": jnp.asarray(b)}
    p4 = quantize_linear_q4(p["w"])
    got = np.asarray(linear_q8(p, p4, jnp.asarray(x), dtype=jnp.float32))
    xb = np.asarray(jnp.asarray(x).astype(jnp.bfloat16), np.float32)
    ref = xb @ np.asarray(_dequant_q4(p4)) + b[None, None, :]
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)
    assert got.shape == (2, 3, 40)


def _rep(w):
    """Project a weight matrix onto the int4 grid (dequant∘quant).

    The projection is a quantization fixed point — requantizing the
    dequantized values reproduces the identical (w4, s) — so a model
    whose weights are ``_rep``'d computes the SAME function through the
    full-precision path and the int4 path; any difference between the
    two is a code bug (plus the quant path's bf16 input casts), not
    quantization noise. Random-init tiny models carry real int4 noise at
    ~35% of the logit range, which would force uselessly loose bounds."""
    return _dequant_q4(quantize_linear_q4(w)).astype(w.dtype)


def _rep_stacked(w):
    return jnp.stack([_rep(w[layer]) for layer in range(w.shape[0])])


class TestWhisperInt4Decode:
    def test_decoder_step_int4_matches_representable_weights(self):
        """With int4-representable decoder weights the quantized decode
        must match full precision to bf16-input-cast rounding: tight
        teacher-forced logit agreement, greedy avg_logprob close."""
        from audio_rag_tpu.models.whisper import (
            WHISPER_PRESETS,
            SpecialTokens,
            decoder_step,
            encode,
            greedy_decode,
            init_whisper,
            precompute_cross_kv,
            quantize_decoder_weights,
        )

        dims = WHISPER_PRESETS["test"]
        st = SpecialTokens.for_dims(dims)
        params = init_whisper(jax.random.PRNGKey(0), dims)
        dec = params["decoder"]
        for grp, names in (("attn", "qkvo"), ("cross", "qo"),
                           ("mlp", ("up", "down"))):
            for n in names:
                p = dec["blocks"][grp][n]
                p["w"] = _rep_stacked(p["w"])
        table = dec["tok_emb"]["table"]
        vocab = table.shape[0]
        vocab_pad = -(-vocab // 128) * 128
        wt = jnp.pad(table.astype(jnp.float32).T,
                     ((0, 0), (0, vocab_pad - vocab)))
        dec["tok_emb"]["table"] = _rep(wt)[:, :vocab].T.astype(table.dtype)
        rng = np.random.default_rng(0)
        mel = jnp.asarray(
            rng.standard_normal((2, dims.n_mels, 2 * dims.n_audio_ctx)),
            jnp.float32)
        enc = encode(params, dims, mel, dtype=jnp.float32)
        q4 = quantize_decoder_weights(params, dims, bits=4)
        assert q4["blocks"][0]["mlp_up"]["w4"].dtype == jnp.int8
        assert "w8" not in q4["blocks"][0]["mlp_up"]

        kv = precompute_cross_kv(params, dims, enc, jnp.float32)
        B, hd = 2, dims.n_text_state // dims.n_text_head
        C = 16
        cache = (jnp.zeros((dims.n_text_layer, B, dims.n_text_head, C, hd),
                           jnp.float32),) * 2
        cache4 = cache
        forced = np.array([[st.sot, st.lang_base, st.transcribe, 7, 9],
                           [st.sot, st.lang_base, st.transcribe, 8, 10]],
                          np.int32)
        for t in range(forced.shape[1]):
            tok = jnp.asarray(forced[:, t:t + 1])
            ref, cache = decoder_step(
                params, dims, tok, kv, jnp.int32(t), cache,
                dtype=jnp.float32)
            got, cache4 = decoder_step(
                params, dims, tok, kv, jnp.int32(t), cache4,
                dtype=jnp.float32, q8=q4)
            denom = np.abs(np.asarray(ref)).max()
            assert np.abs(np.asarray(got - ref)).max() / denom < 0.02, t

        prompt = jnp.asarray(np.tile(
            [[st.sot, st.lang_base, st.transcribe, st.no_timestamps]],
            (2, 1)).astype(np.int32))
        ref = greedy_decode(params, dims, enc, prompt, 8, st.eot,
                            dtype=jnp.float32, no_speech_id=st.no_speech)
        got = greedy_decode(params, dims, enc, prompt, 8, st.eot,
                            dtype=jnp.float32, no_speech_id=st.no_speech,
                            decoder_q8=q4)
        assert np.asarray(got[0]).shape == np.asarray(ref[0]).shape
        np.testing.assert_allclose(np.asarray(ref[1]), np.asarray(got[1]),
                                   atol=0.05)

    def test_param_bytes_accounting(self):
        """bits=4 copies are roughly half the int8 bytes (plus the denser
        group scales), and both match the actual quantized tree size."""
        from audio_rag_tpu.models.whisper import (
            WHISPER_PRESETS,
            init_whisper,
            q8_param_bytes,
            quantize_decoder_weights,
        )

        dims = WHISPER_PRESETS["test"]
        params = init_whisper(jax.random.PRNGKey(0), dims)
        for bits in (8, 4):
            tree = quantize_decoder_weights(params, dims, bits)
            actual = sum(a.size * a.dtype.itemsize
                         for a in jax.tree.leaves(tree))
            assert q8_param_bytes(dims, bits) == actual, bits
        assert q8_param_bytes(dims, 4) < 0.62 * q8_param_bytes(dims, 8)


class TestLLMInt4Decode:
    def test_int4_decoder_weights_logits_close(self):
        """With int4-representable weights (see :func:`_rep`) the int4
        decode step must match full precision to bf16-input-cast
        rounding, teacher-forced over several steps."""
        from audio_rag_tpu.models.llm import (
            LLM_PRESETS,
            init_llm,
            llm_decode_step,
            q8_param_bytes,
            quantize_llm_weights,
        )

        ld = LLM_PRESETS["test"]
        params = init_llm(jax.random.PRNGKey(0), ld)
        for grp, names in (("attn", "qkvo"),
                           ("mlp", ("gate", "up", "down"))):
            for n in names:
                p = params["blocks"][grp][n]
                p["w"] = _rep_stacked(p["w"])
        params["lm_head"]["w"] = _rep(params["lm_head"]["w"])
        q4 = quantize_llm_weights(params, ld, bits=4)
        assert q4["blocks"][0]["mlp_gateup"]["w4"].dtype == jnp.int8
        assert q4["blocks"][0]["attn_qkv"]["w4"].shape == (
            ld.d_model // 2,
            ld.d_model + 2 * ld.n_kv_heads * (ld.d_model // ld.n_heads))
        tree_bytes = sum(a.size * a.dtype.itemsize
                         for a in jax.tree.leaves(q4))
        assert q8_param_bytes(ld, 4) == tree_bytes
        B, hd = 2, ld.d_model // ld.n_heads
        C = 16
        ck = jnp.zeros((ld.n_layers, B, ld.n_kv_heads, C, hd), jnp.float32)
        cv = jnp.zeros_like(ck)
        ck4, cv4 = ck, cv
        forced = np.array([[1, 2, 3, 7, 9, 11], [4, 5, 6, 8, 10, 12]],
                          np.int32)
        for t in range(forced.shape[1]):
            tok = jnp.asarray(forced[:, t])
            pos = jnp.full((B,), t, jnp.int32)
            ref, ck, cv = llm_decode_step(
                params, ld, tok, pos, ck, cv, dtype=jnp.float32)
            got, ck4, cv4 = llm_decode_step(
                params, ld, tok, pos, ck4, cv4, dtype=jnp.float32,
                q8=q4)
            denom = np.abs(np.asarray(ref)).max()
            assert np.abs(np.asarray(got - ref)).max() / denom < 0.02, t

    def test_fused_quant_matches_split(self):
        """attn_qkv / mlp_gateup concatenate the individually-quantized
        matrices exactly — int4 scales span (din-group, dout), both axes
        untouched by a dout concat."""
        from audio_rag_tpu.models.layers import quantize_linear_q4
        from audio_rag_tpu.models.llm import (
            LLM_PRESETS,
            init_llm,
            quantize_llm_weights,
        )

        ld = LLM_PRESETS["test"]
        params = init_llm(jax.random.PRNGKey(0), ld)
        q4 = quantize_llm_weights(params, ld, bits=4)
        p0 = jax.tree.map(lambda a: a[0], params["blocks"])
        qkv = q4["blocks"][0]["attn_qkv"]
        parts = [quantize_linear_q4(p0["attn"][n]["w"]) for n in "qkv"]
        np.testing.assert_array_equal(
            np.asarray(qkv["w4"]),
            np.concatenate([np.asarray(e["w4"]) for e in parts], axis=1))
        np.testing.assert_array_equal(
            np.asarray(qkv["s"]),
            np.concatenate([np.asarray(e["s"]) for e in parts], axis=1))


class TestMixedLMHeadProfile:
    """int8 blocks + int4 lm_head (``lm_head_int4`` — the one matmul
    where the on-chip table shows int4 winning)."""

    def test_mixed_tree_shapes_and_bytes(self):
        from audio_rag_tpu.models.llm import (
            LLM_PRESETS,
            init_llm,
            q8_param_bytes,
            quantize_llm_weights,
        )

        ld = LLM_PRESETS["test"]
        params = init_llm(jax.random.PRNGKey(0), ld)
        qm = quantize_llm_weights(params, ld, bits=8, lm_head_bits=4)
        assert "w8" in qm["blocks"][0]["attn_qkv"]
        assert "w4" in qm["lm_head"]
        tree_bytes = sum(a.size * a.dtype.itemsize
                         for a in jax.tree.leaves(qm))
        assert q8_param_bytes(ld, 8, 4) == tree_bytes
        # plain profiles unchanged by the refactor
        for bits in (8, 4):
            q = quantize_llm_weights(params, ld, bits=bits)
            tb = sum(a.size * a.dtype.itemsize for a in jax.tree.leaves(q))
            assert q8_param_bytes(ld, bits) == tb

    def test_mixed_decode_matches_pure_profiles_componentwise(self):
        """The mixed tree's blocks are EXACTLY the int8 tree's blocks and
        its head EXACTLY the int4 tree's head — so mixed decode equals
        int8 decode with only the head swapped."""
        from audio_rag_tpu.models.llm import (
            LLM_PRESETS,
            init_llm,
            llm_decode_step,
            quantize_llm_weights,
        )

        ld = LLM_PRESETS["test"]
        params = init_llm(jax.random.PRNGKey(0), ld)
        # int4-grid-project the head so its int4 quantization is exact
        # (random tiny weights otherwise carry ~35% real int4 noise and
        # the numeric bound below would have to be uselessly loose)
        params["lm_head"]["w"] = _rep(params["lm_head"]["w"])
        q8 = quantize_llm_weights(params, ld, bits=8)
        q4 = quantize_llm_weights(params, ld, bits=4)
        qm = quantize_llm_weights(params, ld, bits=8, lm_head_bits=4)
        for a, b in zip(jax.tree.leaves(qm["blocks"]),
                        jax.tree.leaves(q8["blocks"])):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(qm["lm_head"]),
                        jax.tree.leaves(q4["lm_head"])):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

        # and the decode step runs the mixed tree end-to-end: identical
        # hidden path to int8 (same blocks); the head is int4-EXACT after
        # the grid projection, so mixed differs from int8 only by the
        # int8 head's own rounding (sub-percent)
        B, hd = 2, ld.d_model // ld.n_heads
        ck = jnp.zeros((ld.n_layers, B, ld.n_kv_heads, 16, hd), jnp.float32)
        cv = jnp.zeros_like(ck)
        tok = jnp.asarray([3, 5], jnp.int32)
        pos = jnp.zeros((B,), jnp.int32)
        ref8, _, _ = llm_decode_step(params, ld, tok, pos, ck, cv,
                                     dtype=jnp.float32, q8=q8)
        got, _, _ = llm_decode_step(params, ld, tok, pos, ck, cv,
                                    dtype=jnp.float32, q8=qm)
        denom = np.abs(np.asarray(ref8)).max()
        assert np.abs(np.asarray(got - ref8)).max() / denom < 0.05

    def test_generator_wiring(self):
        from audio_rag_tpu.config.schema import GenerationConfig
        from audio_rag_tpu.generation.llm_jax import LLMGenerator

        g = LLMGenerator(GenerationConfig(
            model="test", decoder_int8=True, lm_head_int4=True))
        assert g._decoder_qbits == 8 and g._lm_head_bits == 4
        # lm_head_int4 without any decoder quant is inert
        g2 = LLMGenerator(GenerationConfig(model="test", lm_head_int4=True))
        assert g2._decoder_qbits == 0 and g2._lm_head_bits is None
        g2.load()
        try:
            assert g2._params_q8 is None
        finally:
            g2.unload()
        g.load()
        try:
            assert "w4" in g._params_q8["lm_head"]
            assert "w8" in g._params_q8["blocks"][0]["attn_qkv"]
            out = g.generate("hello world", max_tokens=4)
            assert isinstance(out, str)
        finally:
            g.unload()


class TestConfigWiring:
    def test_backends_pick_int4_over_int8(self):
        from audio_rag_tpu.asr.whisper_jax import WhisperJaxASR
        from audio_rag_tpu.config.schema import ASRConfig, GenerationConfig
        from audio_rag_tpu.generation.llm_jax import LLMGenerator

        asr = WhisperJaxASR(ASRConfig(
            model_size="test", decoder_int8=True, decoder_int4=True))
        assert asr._decoder_qbits == 4
        base = WhisperJaxASR(ASRConfig(model_size="test"))
        assert base._decoder_qbits == 0
        assert asr.hbm_required_gb > base.hbm_required_gb

        gen4 = LLMGenerator(GenerationConfig(
            model="test", decoder_int4=True))
        gen8 = LLMGenerator(GenerationConfig(
            model="test", decoder_int8=True))
        gen0 = LLMGenerator(GenerationConfig(model="test"))
        assert gen4._decoder_qbits == 4 and gen8._decoder_qbits == 8
        assert gen0.hbm_required_gb < gen4.hbm_required_gb \
            < gen8.hbm_required_gb


class TestWhisperMixedLMHead:
    """int8 blocks + int4 logits head for the ASR decode loop
    (``ASRConfig.lm_head_int4`` — whisper analog of the LLM mixed
    profile above; the (1280, 51968) vocab projection is the one decode
    matmul where the on-chip table shows int4 beating int8)."""

    def test_mixed_tree_componentwise_and_bytes(self):
        from audio_rag_tpu.models.whisper import (
            WHISPER_PRESETS,
            init_whisper,
            q8_param_bytes,
            quantize_decoder_weights,
        )

        dims = WHISPER_PRESETS["test"]
        params = init_whisper(jax.random.PRNGKey(0), dims)
        q8 = quantize_decoder_weights(params, dims, bits=8)
        q4 = quantize_decoder_weights(params, dims, bits=4)
        qm = quantize_decoder_weights(params, dims, bits=8, lm_head_bits=4)
        assert "w8" in qm["blocks"][0]["mlp_up"]
        assert "w4" in qm["logits"] and "w8" not in qm["logits"]
        # mixed = int8's blocks + int4's head, exactly
        for a, b in zip(jax.tree.leaves(qm["blocks"]),
                        jax.tree.leaves(q8["blocks"])):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(qm["logits"]),
                        jax.tree.leaves(q4["logits"])):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        tree_bytes = sum(a.size * a.dtype.itemsize
                         for a in jax.tree.leaves(qm))
        assert q8_param_bytes(dims, 8, 4) == tree_bytes
        # plain profiles unchanged by the refactor
        for bits in (8, 4):
            t = quantize_decoder_weights(params, dims, bits=bits)
            tb = sum(a.size * a.dtype.itemsize for a in jax.tree.leaves(t))
            assert q8_param_bytes(dims, bits) == tb

    def test_mixed_greedy_decode_close_to_int8(self):
        """Grid-project the token table so its int4 quantization is
        exact; then mixed greedy decode matches the int8 profile's
        within the int8 head's own rounding."""
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
        params = init_whisper(jax.random.PRNGKey(0), dims)
        table = params["decoder"]["tok_emb"]["table"]
        vocab = table.shape[0]
        vocab_pad = -(-vocab // 128) * 128
        wt = jnp.pad(table.astype(jnp.float32).T,
                     ((0, 0), (0, vocab_pad - vocab)))
        params["decoder"]["tok_emb"]["table"] = (
            _rep(wt)[:, :vocab].T.astype(table.dtype))
        rng = np.random.default_rng(1)
        mel = jnp.asarray(
            rng.standard_normal((2, dims.n_mels, 2 * dims.n_audio_ctx)),
            jnp.float32)
        enc = encode(params, dims, mel, dtype=jnp.float32)
        q8 = quantize_decoder_weights(params, dims, bits=8)
        qm = quantize_decoder_weights(params, dims, bits=8, lm_head_bits=4)
        prompt = jnp.asarray(np.tile(
            [[st.sot, st.lang_base, st.transcribe, st.no_timestamps]],
            (2, 1)).astype(np.int32))
        ref = greedy_decode(params, dims, enc, prompt, 8, st.eot,
                            dtype=jnp.float32, no_speech_id=st.no_speech,
                            decoder_q8=q8)
        got = greedy_decode(params, dims, enc, prompt, 8, st.eot,
                            dtype=jnp.float32, no_speech_id=st.no_speech,
                            decoder_q8=qm)
        np.testing.assert_allclose(np.asarray(ref[1]), np.asarray(got[1]),
                                   atol=0.05)

    def test_asr_backend_wiring(self):
        from audio_rag_tpu.asr.whisper_jax import WhisperJaxASR
        from audio_rag_tpu.config.schema import ASRConfig

        asr = WhisperJaxASR(ASRConfig(
            model_size="test", compute_type="float32", vad_filter=False,
            decoder_int8=True, lm_head_int4=True))
        assert asr._decoder_qbits == 8 and asr._lm_head_bits == 4
        # inert without int8 decoder quant (decoder_int4 covers the head)
        inert = WhisperJaxASR(ASRConfig(model_size="test",
                                        lm_head_int4=True))
        assert inert._decoder_qbits == 0 and inert._lm_head_bits is None
        allq4 = WhisperJaxASR(ASRConfig(
            model_size="test", decoder_int4=True, lm_head_int4=True))
        assert allq4._decoder_qbits == 4 and allq4._lm_head_bits is None
        # mixed copies are smaller than all-int8's (int4 head)
        pure8 = WhisperJaxASR(ASRConfig(model_size="test",
                                        decoder_int8=True))
        assert asr.hbm_required_gb < pure8.hbm_required_gb
        asr.load()
        try:
            assert "w4" in asr._params_q8["logits"]
            assert "w8" in asr._params_q8["blocks"][0]["mlp_up"]
            audio = (0.2 * np.random.default_rng(2)
                     .standard_normal(16000)).astype(np.float32)
            segs = asr.transcribe(audio, 16000)
            assert isinstance(segs, list)
        finally:
            asr.unload()
