"""Tests for BERT backbone, BGE-M3 heads, cross-encoder, LLM, speaker nets
(tiny presets, fp32 on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audio_rag_tpu.models.bert import BERT_PRESETS, bert_encode, init_bert
from audio_rag_tpu.models.bgem3 import bgem3_forward, init_bgem3
from audio_rag_tpu.models.cross_encoder import (
    cross_encoder_forward,
    init_cross_encoder,
)
from audio_rag_tpu.models.llm import (
    LLM_PRESETS,
    init_llm,
    llm_forward,
    llm_generate,
)
from audio_rag_tpu.models.speaker import (
    SPEAKER_PRESETS,
    init_speaker_encoder,
    init_vad,
    speaker_embed,
    vad_scores,
)

BD = BERT_PRESETS["test"]
LD = LLM_PRESETS["test"]
SD = SPEAKER_PRESETS["test"]


class TestBert:
    def test_shapes_and_mask(self):
        p = init_bert(jax.random.PRNGKey(0), BD)
        tok = jnp.array([[5, 6, 7, BD.pad_id], [8, 9, BD.pad_id, BD.pad_id]])
        h = bert_encode(p, BD, tok, dtype=jnp.float32)
        assert h.shape == (2, 4, BD.d_model)

    def test_padding_invariance(self):
        """Extra padding must not change real-token states."""
        p = init_bert(jax.random.PRNGKey(0), BD)
        short = jnp.array([[5, 6, 7]])
        long = jnp.array([[5, 6, 7, BD.pad_id, BD.pad_id]])
        h1 = bert_encode(p, BD, short, dtype=jnp.float32)
        h2 = bert_encode(p, BD, long, dtype=jnp.float32)
        np.testing.assert_allclose(
            np.asarray(h1[0, :3]), np.asarray(h2[0, :3]), atol=1e-5
        )


class TestBGEM3:
    def test_outputs(self):
        p = init_bgem3(jax.random.PRNGKey(1), BD)
        tok = jnp.array([[1, 5, 6, 2, 0, 0]])
        mask = jnp.array([[1, 1, 1, 1, 0, 0]])
        dense, w = bgem3_forward(p, BD, tok, mask, dtype=jnp.float32)
        assert dense.shape == (1, BD.d_model)
        np.testing.assert_allclose(
            float(jnp.linalg.norm(dense[0])), 1.0, atol=1e-5
        )
        assert w.shape == (1, 6)
        assert (np.asarray(w) >= 0).all()
        assert np.asarray(w)[0, 4:].sum() == 0  # padding weights are zero


class TestCrossEncoder:
    def test_scores(self):
        p = init_cross_encoder(jax.random.PRNGKey(2), BD)
        tok = jnp.array([[1, 5, 6, 2], [1, 7, 8, 2]])
        mask = jnp.ones_like(tok)
        s = cross_encoder_forward(p, BD, tok, mask, dtype=jnp.float32)
        assert s.shape == (2,)
        assert np.isfinite(np.asarray(s)).all()


class TestLLM:
    @pytest.fixture(scope="class")
    def params(self):
        return init_llm(jax.random.PRNGKey(3), LD)

    def test_forward_shapes(self, params):
        tok = jnp.array([[1, 2, 3, 4]])
        logits, cache = llm_forward(params, LD, tok, dtype=jnp.float32)
        assert logits.shape == (1, 4, LD.vocab)
        assert cache is None

    def test_storage_dtype_init_matches_cast(self, params):
        """The memory-bounded scan init (storage_dtype=bf16) must equal
        casting the eager fp32 init up to 1 bf16 ULP (XLA may fuse
        ``normal * scale`` into the cast under jit, double-rounding
        boundary cases)."""
        scanned = jax.jit(
            lambda k: init_llm(k, LD, storage_dtype=jnp.bfloat16)
        )(jax.random.PRNGKey(3))
        ref = jax.tree.map(
            lambda x: x.astype(jnp.bfloat16)
            if x.dtype == jnp.float32 else x, params)
        for a, b in zip(jax.tree.leaves(scanned), jax.tree.leaves(ref)):
            assert a.dtype == b.dtype
            np.testing.assert_allclose(
                np.asarray(a, np.float32), np.asarray(b, np.float32),
                rtol=1e-2, atol=1e-4,
            )

    def test_incremental_matches_full(self, params):
        tok = jnp.array([[7, 11, 13, 17]])
        full, _ = llm_forward(params, LD, tok, dtype=jnp.float32)
        hd = LD.d_model // LD.n_heads
        lk = jnp.zeros((LD.n_layers, 1, LD.n_kv_heads, 4, hd), jnp.float32)
        cache = (lk, jnp.zeros_like(lk))
        outs = []
        for i in range(4):
            lg, cache = llm_forward(
                params, LD, tok[:, i : i + 1], i, cache, jnp.float32
            )
            outs.append(np.asarray(lg[0, 0]))
        np.testing.assert_allclose(
            np.stack(outs), np.asarray(full[0]), atol=2e-4, rtol=1e-4
        )

    def test_decode_step_matches_forward(self, params):
        """llm_decode_step (grouped-GQA attention, no cache repeat) must
        reproduce llm_forward's per-position logits — the two implement
        the same contraction with different batching of the query
        heads."""
        from audio_rag_tpu.models.llm import llm_decode_step

        tok = jnp.array([[7, 11, 13, 17], [2, 3, 5, 19]], jnp.int32)
        full, _ = llm_forward(params, LD, tok, dtype=jnp.float32)
        hd = LD.d_model // LD.n_heads
        B = tok.shape[0]
        ck = jnp.zeros((LD.n_layers, B, LD.n_kv_heads, 8, hd), jnp.float32)
        cv = jnp.zeros_like(ck)
        for t in range(tok.shape[1]):
            pos = jnp.full((B,), t, jnp.int32)
            lg, ck, cv = llm_decode_step(
                params, LD, tok[:, t], pos, ck, cv, dtype=jnp.float32)
            np.testing.assert_allclose(
                np.asarray(lg), np.asarray(full[:, t]),
                atol=2e-4, rtol=1e-4)

    def test_fused_quant_matches_split(self, params):
        """attn_qkv / mlp_gateup are concatenations of the individually
        per-out-channel-quantized matrices — exact int8/scale equality,
        so the fused matmul is bitwise the split matmuls."""
        from audio_rag_tpu.models.layers import quantize_linear
        from audio_rag_tpu.models.llm import quantize_llm_weights

        q8 = quantize_llm_weights(params, LD)
        p0 = jax.tree.map(lambda a: a[0], params["blocks"])
        qkv = q8["blocks"][0]["attn_qkv"]
        parts = [quantize_linear(p0["attn"][n]["w"]) for n in "qkv"]
        np.testing.assert_array_equal(
            np.asarray(qkv["w8"]),
            np.concatenate([np.asarray(e["w8"]) for e in parts], axis=1))
        np.testing.assert_array_equal(
            np.asarray(qkv["s"]),
            np.concatenate([np.asarray(e["s"]) for e in parts]))
        gu = q8["blocks"][0]["mlp_gateup"]
        parts = [quantize_linear(p0["mlp"][n]["w"])
                 for n in ("gate", "up")]
        np.testing.assert_array_equal(
            np.asarray(gu["w8"]),
            np.concatenate([np.asarray(e["w8"]) for e in parts], axis=1))

    def test_greedy_generate_deterministic(self, params):
        prompt = jnp.array([[1, 2, 3]], jnp.int32)
        o1 = llm_generate(params, LD, prompt, 5, eos_id=2, dtype=jnp.float32)
        o2 = llm_generate(params, LD, prompt, 5, eos_id=2, dtype=jnp.float32)
        assert o1.shape == (1, 8)
        np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))

    def test_sampling_respects_temperature(self, params):
        prompt = jnp.array([[1, 2, 3]], jnp.int32)
        a = llm_generate(params, LD, prompt, 8, eos_id=2, temperature=1.0,
                         rng=jax.random.PRNGKey(0), dtype=jnp.float32)
        b = llm_generate(params, LD, prompt, 8, eos_id=2, temperature=1.0,
                         rng=jax.random.PRNGKey(1), dtype=jnp.float32)
        # different RNG keys should (overwhelmingly) differ
        assert not np.array_equal(np.asarray(a), np.asarray(b))

    def test_int8_decoder_weights_logits_close(self, params):
        """decoder_q8 (int8 weight matmuls in the decode loop) stays
        within quantization tolerance of the full-precision step: the
        teacher-forced per-step logits must track within a few percent of
        the logit range (greedy tokens can legitimately differ at
        random-init near-ties, so exact token equality over-pins)."""
        from audio_rag_tpu.models.llm import (
            llm_decode_step, quantize_llm_weights)

        q8 = quantize_llm_weights(params, LD)
        assert q8["blocks"][0]["mlp_gateup"]["w8"].dtype == jnp.int8
        assert q8["blocks"][0]["attn_qkv"]["w8"].shape[1] == (
            LD.d_model + 2 * LD.n_kv_heads * (LD.d_model // LD.n_heads))
        assert len(q8["blocks"]) == LD.n_layers
        B, hd = 2, LD.d_model // LD.n_heads
        C = 16
        ck = jnp.zeros((LD.n_layers, B, LD.n_kv_heads, C, hd), jnp.float32)
        cv = jnp.zeros_like(ck)
        ck8, cv8 = ck, cv
        forced = np.array([[1, 2, 3, 7, 9, 11], [4, 5, 6, 8, 10, 12]],
                          np.int32)
        for t in range(forced.shape[1]):
            tok = jnp.asarray(forced[:, t])
            pos = jnp.full((B,), t, jnp.int32)
            ref, ck, cv = llm_decode_step(
                params, LD, tok, pos, ck, cv, dtype=jnp.float32)
            got, ck8, cv8 = llm_decode_step(
                params, LD, tok, pos, ck8, cv8, dtype=jnp.float32, q8=q8)
            denom = float(np.abs(np.asarray(ref)).max()) + 1e-9
            err = float(np.abs(np.asarray(got) - np.asarray(ref)).max())
            assert err / denom < 0.05, (
                f"int8-weight logit error {err / denom:.3f} at step {t}")


class TestSpeaker:
    def test_embed_normalized(self):
        p = init_speaker_encoder(jax.random.PRNGKey(4), SD)
        mel = jnp.asarray(
            np.random.default_rng(0).standard_normal((3, SD.n_mels, 50)),
            jnp.float32,
        )
        e = speaker_embed(p, SD, mel, dtype=jnp.float32)
        assert e.shape == (3, SD.emb_dim)
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(e), axis=1), 1.0, atol=1e-5
        )

    def test_vad_probability_range(self):
        p = init_vad(jax.random.PRNGKey(5), n_mels=SD.n_mels, channels=16)
        mel = jnp.asarray(
            np.random.default_rng(1).standard_normal((2, SD.n_mels, 40)),
            jnp.float32,
        )
        s = vad_scores(p, mel, dtype=jnp.float32)
        assert s.shape == (2, 40)
        assert (np.asarray(s) >= 0).all() and (np.asarray(s) <= 1).all()


class TestTokenizer:
    def test_hash_tokenizer_deterministic(self):
        from audio_rag_tpu.text.tokenizer import HashWordTokenizer

        t1 = HashWordTokenizer()
        t2 = HashWordTokenizer()
        ids1 = t1.encode("Gradient descent converges")
        ids2 = t2.encode("gradient DESCENT converges!")
        assert ids1 == ids2  # case/punct-insensitive, cross-instance stable
        assert ids1[0] == t1.cls_id and ids1[-1] == t1.sep_id

    def test_decode_roundtrip(self):
        from audio_rag_tpu.text.tokenizer import HashWordTokenizer

        t = HashWordTokenizer()
        ids = t.encode("hello world")
        assert t.decode(ids) == "hello world"

    def test_encode_pair_truncates(self):
        from audio_rag_tpu.text.tokenizer import HashWordTokenizer

        t = HashWordTokenizer()
        ids = t.encode_pair("q", "long " * 100, max_len=16)
        assert len(ids) <= 16

    def test_pad_batch(self):
        from audio_rag_tpu.text.tokenizer import pad_batch

        out, mask = pad_batch([[1, 2], [3]], 4, 0)
        assert out.tolist() == [[1, 2, 0, 0], [3, 0, 0, 0]]
        assert mask.tolist() == [[1, 1, 0, 0], [1, 0, 0, 0]]
