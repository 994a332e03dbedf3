"""Logit-level parity against HuggingFace torch reference implementations.

Tiny random-init HF models (no downloads) are saved to disk, converted with
``audio_rag_tpu.convert``, and must reproduce the torch logits — this pins
the architecture implementations AND the converters, so released
checkpoints (whisper-large-v3, bge-m3, bge-reranker, llama) load correctly
in weight-available deployments.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


class TestWhisperParity:
    @pytest.fixture(scope="class")
    def hf_and_ours(self, tmp_path_factory):
        from transformers import WhisperConfig, WhisperForConditionalGeneration

        from audio_rag_tpu.convert import convert_whisper
        from audio_rag_tpu.models.whisper import WhisperDims

        cfg = WhisperConfig(
            vocab_size=200, num_mel_bins=80,
            encoder_layers=2, encoder_attention_heads=2,
            decoder_layers=2, decoder_attention_heads=2,
            d_model=64, encoder_ffn_dim=256, decoder_ffn_dim=256,
            max_source_positions=60, max_target_positions=32,
            pad_token_id=0, bos_token_id=1, eos_token_id=2,
            decoder_start_token_id=1, suppress_tokens=None,
            begin_suppress_tokens=None,
        )
        torch.manual_seed(0)
        model = WhisperForConditionalGeneration(cfg).eval()
        d = tmp_path_factory.mktemp("hf_whisper")
        model.save_pretrained(d, safe_serialization=True)
        params = convert_whisper(d)
        dims = WhisperDims(80, 60, 64, 2, 2, 200, 32, 64, 2, 2)
        return model, params, dims

    def test_logits_match(self, hf_and_ours):
        from audio_rag_tpu.models.whisper import (
            decoder_forward,
            encode,
            precompute_cross_kv,
        )

        model, params, dims = hf_and_ours
        rng = np.random.default_rng(0)
        mel = rng.standard_normal((1, 80, 120)).astype(np.float32)
        dec_ids = np.array([[1, 5, 9, 13]], np.int64)

        with torch.no_grad():
            ref = model(
                input_features=torch.from_numpy(mel),
                decoder_input_ids=torch.from_numpy(dec_ids),
            ).logits.numpy()

        jp = jax.tree.map(jnp.asarray, params)
        enc = encode(jp, dims, jnp.asarray(mel), dtype=jnp.float32)
        ckv = precompute_cross_kv(jp, dims, enc, dtype=jnp.float32)
        ours, _, _ = decoder_forward(
            jp, dims, jnp.asarray(dec_ids.astype(np.int32)), ckv,
            dtype=jnp.float32,
        )
        np.testing.assert_allclose(
            np.asarray(ours), ref, atol=6e-3, rtol=2e-2
        )

    def test_int8_decode_path_matches_on_real_checkpoint(self, hf_and_ours):
        """The int8 decode path (cross_kv_int8 + decoder_int8) validated
        against a REAL (tiny HF) whisper checkpoint, not random init:
        greedy tokens must match the full-precision decode and avg
        logprob stay within quantization tolerance — the evidence behind
        `configs/production.yaml` enabling the flags."""
        from audio_rag_tpu.models.whisper import (
            encode,
            greedy_decode,
            quantize_decoder_weights,
        )

        model, params, dims = hf_and_ours
        rng = np.random.default_rng(1)
        mel = rng.standard_normal((2, 80, 120)).astype(np.float32)
        jp = jax.tree.map(jnp.asarray, params)
        enc = encode(jp, dims, jnp.asarray(mel), dtype=jnp.float32)
        prompt = jnp.asarray(np.tile([[1, 5]], (2, 1)).astype(np.int32))
        ref = greedy_decode(jp, dims, enc, prompt, 12, eot=2,
                            dtype=jnp.float32)
        q8 = quantize_decoder_weights(jp, dims)
        got = greedy_decode(jp, dims, enc, prompt, 12, eot=2,
                            dtype=jnp.float32, cross_kv_quantize=True,
                            decoder_q8=q8)
        np.testing.assert_array_equal(np.asarray(ref[0]), np.asarray(got[0]))
        np.testing.assert_allclose(np.asarray(ref[1]), np.asarray(got[1]),
                                   atol=0.1)

    def test_int4_decode_path_on_converted_checkpoint(self, hf_and_ours):
        """The FULL int4 decode profile (decoder_int4 + cross_kv_int4)
        through a CONVERTED HF whisper checkpoint: same greedy tokens as
        full precision on this fixed seed, avg logprob within int4
        tolerance (~16x int8's noise, hence the looser atol). Complements
        the representable-weight exactness test in
        tests/unit/ops/test_matmul_q4w.py."""
        from audio_rag_tpu.models.whisper import (
            encode,
            greedy_decode,
            quantize_decoder_weights,
        )

        model, params, dims = hf_and_ours
        rng = np.random.default_rng(1)
        mel = rng.standard_normal((2, 80, 120)).astype(np.float32)
        jp = jax.tree.map(jnp.asarray, params)
        enc = encode(jp, dims, jnp.asarray(mel), dtype=jnp.float32)
        prompt = jnp.asarray(np.tile([[1, 5]], (2, 1)).astype(np.int32))
        ref = greedy_decode(jp, dims, enc, prompt, 12, eot=2,
                            dtype=jnp.float32)
        q4 = quantize_decoder_weights(jp, dims, bits=4)
        assert "w4" in q4["blocks"][0]["mlp_up"]
        got = greedy_decode(jp, dims, enc, prompt, 12, eot=2,
                            dtype=jnp.float32, cross_kv_quantize=True,
                            cross_kv_bits=4, decoder_q8=q4)
        np.testing.assert_array_equal(np.asarray(ref[0]), np.asarray(got[0]))
        np.testing.assert_allclose(np.asarray(ref[1]), np.asarray(got[1]),
                                   atol=0.3)


class TestXLMRobertaParity:
    def test_encoder_states_match(self, tmp_path):
        from transformers import XLMRobertaConfig, XLMRobertaModel

        from audio_rag_tpu.convert import convert_xlmr_encoder, load_state_dict
        from audio_rag_tpu.models.bert import BertDims, bert_encode

        cfg = XLMRobertaConfig(
            vocab_size=300, hidden_size=64, num_hidden_layers=2,
            num_attention_heads=2, intermediate_size=128,
            max_position_embeddings=40, pad_token_id=1,
        )
        torch.manual_seed(0)
        model = XLMRobertaModel(cfg, add_pooling_layer=False).eval()
        model.save_pretrained(tmp_path, safe_serialization=True)
        sd = load_state_dict(tmp_path)
        params = convert_xlmr_encoder(sd)

        ids = np.array([[0, 17, 23, 42, 2, 1, 1]], np.int64)  # pad tail
        mask = (ids != 1).astype(np.int64)
        with torch.no_grad():
            ref = model(
                input_ids=torch.from_numpy(ids),
                attention_mask=torch.from_numpy(mask),
            ).last_hidden_state.numpy()

        dims = BertDims(300, 64, 2, 2, 128, 38, pad_id=1)
        jp = jax.tree.map(jnp.asarray, params)
        ours = bert_encode(
            jp, dims, jnp.asarray(ids.astype(np.int32)),
            jnp.asarray(mask.astype(np.int32)), dtype=jnp.float32,
        )
        # compare real-token positions (pad positions are don't-care)
        np.testing.assert_allclose(
            np.asarray(ours)[0, :5], ref[0, :5], atol=6e-3, rtol=2e-2
        )


class TestNliParity:
    def test_3class_head_matches_hf(self, tmp_path):
        """A 3-label XLMRobertaForSequenceClassification (the mnli model
        family) converts via convert_reranker and reproduces HF logits
        through nli_forward — real NLI checkpoints are a drop-in."""
        from transformers import (
            XLMRobertaConfig,
            XLMRobertaForSequenceClassification,
        )

        from audio_rag_tpu.convert import convert_reranker
        from audio_rag_tpu.models.bert import BertDims
        from audio_rag_tpu.models.cross_encoder import nli_forward

        cfg = XLMRobertaConfig(
            vocab_size=300, hidden_size=64, num_hidden_layers=2,
            num_attention_heads=2, intermediate_size=128,
            max_position_embeddings=40, pad_token_id=1, num_labels=3,
        )
        torch.manual_seed(0)
        model = XLMRobertaForSequenceClassification(cfg).eval()
        model.save_pretrained(tmp_path, safe_serialization=True)
        params = convert_reranker(tmp_path)

        ids = np.array([[0, 17, 23, 2, 2, 42, 99, 2]], np.int64)
        mask = np.ones_like(ids)
        with torch.no_grad():
            ref = model(
                input_ids=torch.from_numpy(ids),
                attention_mask=torch.from_numpy(mask),
            ).logits.numpy()

        dims = BertDims(300, 64, 2, 2, 128, 38, pad_id=1)
        jp = jax.tree.map(jnp.asarray, params)
        ours = np.asarray(nli_forward(
            jp, dims, jnp.asarray(ids.astype(np.int32)),
            jnp.asarray(mask.astype(np.int32)), dtype=jnp.float32,
        ))
        assert ours.shape == (1, 3)
        np.testing.assert_allclose(ours, ref, atol=6e-3, rtol=2e-2)


class TestVadConvParity:
    def test_vad_matches_torch_conv_stack(self):
        """Pin _conv1d SAME-padding/dilation + LayerNorm semantics against
        torch, via convert_vad_torch — so a real Silero/marblenet-class
        checkpoint conversion is a mechanical weight mapping."""
        import torch.nn as nn

        from audio_rag_tpu.convert import convert_vad_torch
        from audio_rag_tpu.models.speaker import vad_scores

        n_mels, ch, T = 80, 64, 50

        class TorchVad(nn.Module):
            def __init__(self):
                super().__init__()
                self.c1 = nn.Conv1d(n_mels, ch, 5, padding=2)
                self.ln1 = nn.LayerNorm(ch)
                self.c2 = nn.Conv1d(ch, ch, 5, padding=4, dilation=2)
                self.ln2 = nn.LayerNorm(ch)
                self.out = nn.Linear(ch, 1)

            def forward(self, mel):  # (B, n_mels, T)
                x = torch.relu(self.ln1(self.c1(mel).transpose(1, 2)))
                x = torch.relu(
                    self.ln2(self.c2(x.transpose(1, 2)).transpose(1, 2))
                )
                return torch.sigmoid(self.out(x)[..., 0])

        torch.manual_seed(0)
        model = TorchVad().eval()
        sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
        params = jax.tree.map(jnp.asarray, convert_vad_torch(sd))

        rng = np.random.default_rng(0)
        mel = rng.standard_normal((2, n_mels, T)).astype(np.float32)
        with torch.no_grad():
            ref = model(torch.from_numpy(mel)).numpy()
        ours = np.asarray(vad_scores(params, jnp.asarray(mel),
                                     dtype=jnp.float32))
        np.testing.assert_allclose(ours, ref, atol=2e-5, rtol=1e-4)


class TestLlamaParity:
    def test_causal_lm_logits_match(self, tmp_path):
        from transformers import LlamaConfig, LlamaForCausalLM

        from audio_rag_tpu.convert import convert_llama
        from audio_rag_tpu.models.llm import LLMDims, llm_forward

        cfg = LlamaConfig(
            vocab_size=256, hidden_size=64, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2, max_position_embeddings=64,
            rope_theta=10000.0, tie_word_embeddings=False,
        )
        torch.manual_seed(0)
        model = LlamaForCausalLM(cfg).eval()
        model.save_pretrained(tmp_path, safe_serialization=True)
        params = convert_llama(tmp_path)

        ids = np.array([[3, 17, 99, 254, 8]], np.int64)
        with torch.no_grad():
            ref = model(torch.from_numpy(ids)).logits.numpy()

        dims = LLMDims(256, 64, 4, 2, 2, 128, 64, rope_theta=10000.0)
        jp = jax.tree.map(jnp.asarray, params)
        ours, _ = llm_forward(
            jp, dims, jnp.asarray(ids.astype(np.int32)), dtype=jnp.float32
        )
        np.testing.assert_allclose(
            np.asarray(ours), ref, atol=6e-3, rtol=2e-2
        )
