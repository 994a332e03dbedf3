"""Batched query pipeline path + language detection + tracing spans."""

import numpy as np
import pytest

from audio_rag_tpu.config.schema import AudioRAGConfig
from audio_rag_tpu.pipeline.orchestrator import AudioRAG


@pytest.fixture
def rag_real_tiny():
    """Tiny REAL models so the fused engine path activates."""
    return AudioRAG(AudioRAGConfig(**{
        "asr": {"backend": "fake"},
        "diarization": {"backend": "fake"},
        "embedding": {"backend": "bge-m3", "model": "test"},
        "retrieval": {"backend": "tpu", "capacity_step": 128},
        "reranking": {"backend": "bge-reranker", "model": "test"},
        "generation": {"backend": "none"},
    }))


class TestQueryBatch:
    def test_fused_path_active_and_consistent(self, rag_real_tiny, tmp_path):
        from audio_rag_tpu.audio.io import write_wav

        p = tmp_path / "x.wav"
        write_wav(
            p,
            (0.1 * np.random.default_rng(0).standard_normal(16000 * 10))
            .astype(np.float32), 16000,
        )
        rag_real_tiny.ingest(str(p))
        assert rag_real_tiny.querying.fused_engine is not None
        out = rag_real_tiny.query_batch(
            ["word0 word1", "word4 word5"], top_k=2, search_type="hybrid"
        )
        assert len(out) == 2
        assert all(len(r.results) <= 2 for r in out)
        assert all(r.response for r in out)

    def test_fused_falls_back_with_fake_embedder(self):
        rag = AudioRAG(AudioRAGConfig(**{
            "asr": {"backend": "fake"},
            "diarization": {"backend": "fake"},
            "embedding": {"backend": "fake"},
            "reranking": {"backend": "fake"},
            "generation": {"backend": "none"},
        }))
        assert rag.querying.fused_engine is None
        assert rag.query_batch(["q"], top_k=3) is not None  # loop fallback


class TestLanguageDetection:
    def test_detect_language_runs(self):
        from audio_rag_tpu.asr.whisper_jax import WhisperJaxASR
        from audio_rag_tpu.config.schema import ASRConfig

        asr = WhisperJaxASR(ASRConfig(model_size="test",
                                      compute_type="float32"))
        asr.load()
        audio = (0.2 * np.random.default_rng(0).standard_normal(16000)) \
            .astype(np.float32)
        lang, prob = asr.detect_language(audio, 16000)
        assert 0 <= lang < 100
        assert 0.0 <= prob <= 1.0


class TestTracing:
    def test_spans_aggregate_into_status(self, rag_real_tiny, tmp_path):
        from audio_rag_tpu.audio.io import write_wav
        from audio_rag_tpu.utils.tracing import reset_traces

        reset_traces()
        p = tmp_path / "y.wav"
        write_wav(
            p,
            (0.1 * np.random.default_rng(1).standard_normal(16000 * 5))
            .astype(np.float32), 16000,
        )
        rag_real_tiny.ingest(str(p))
        rag_real_tiny.query("word0", rerank=False)
        traces = rag_real_tiny.status()["traces"]
        assert "ingest.transcribe" in traces
        # real BGE-M3 + TPU store → the fused single-program span fires
        assert "query.fused" in traces
        assert traces["query.fused"]["count"] >= 1
        # the unfused spans fire when a metadata filter forces the long path
        rag_real_tiny.query("word0", rerank=False,
                            metadata_filter={"source": "nope"})
        traces = rag_real_tiny.status()["traces"]
        assert "query.embed" in traces and "query.search" in traces


class TestLanguageMapping:
    def test_language_offsets(self):
        from audio_rag_tpu.models.whisper import (
            WHISPER_LANGUAGES,
            language_offset,
        )

        assert language_offset("en") == 0
        assert language_offset("ZH") == 1
        assert language_offset("yue") == 99
        assert len(WHISPER_LANGUAGES) == 100
        with pytest.raises(ValueError):
            language_offset("klingon")

    def test_explicit_language_sets_prompt_token(self):
        from audio_rag_tpu.asr.whisper_jax import WhisperJaxASR
        from audio_rag_tpu.config.schema import ASRConfig

        asr = WhisperJaxASR(ASRConfig(
            model_size="test", compute_type="float32", vad_filter=False,
            temperature_fallback=False, language="de",
        ))
        asr.load()
        audio = (0.2 * np.random.default_rng(0).standard_normal(16000)) \
            .astype(np.float32)
        segs = asr.transcribe(audio, 16000)
        assert segs and segs[0].language == "de"

    def test_unknown_language_falls_back(self):
        from audio_rag_tpu.asr.whisper_jax import WhisperJaxASR
        from audio_rag_tpu.config.schema import ASRConfig

        asr = WhisperJaxASR(ASRConfig(
            model_size="test", compute_type="float32", vad_filter=False,
            temperature_fallback=False, language="klingon",
        ))
        asr.load()
        audio = (0.2 * np.random.default_rng(0).standard_normal(16000)) \
            .astype(np.float32)
        segs = asr.transcribe(audio, 16000)
        assert segs and segs[0].language == "en"
