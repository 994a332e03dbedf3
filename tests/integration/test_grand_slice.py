"""Grand slice: every REAL component family composes end to end on tiny
presets — whisper-jax ASR, clustering diarizer, BGE-M3 embedder, TPU store,
BGE reranker, llm-jax generation (scheduled), HyDE, contextual headers,
null TTS, evaluation harness. No fakes anywhere in the model path."""

import numpy as np
import pytest

from audio_rag_tpu.audio.io import write_wav
from audio_rag_tpu.config.schema import AudioRAGConfig
from audio_rag_tpu.pipeline.orchestrator import AudioRAG


@pytest.fixture(scope="module")
def rag():
    return AudioRAG(AudioRAGConfig(**{
        "asr": {"backend": "whisper-jax", "model_size": "test",
                "compute_type": "float32", "vad_filter": True,
                "temperature_fallback": False},
        "diarization": {"backend": "clustering", "model": "test"},
        "embedding": {"backend": "bge-m3", "model": "test"},
        "retrieval": {"backend": "tpu", "capacity_step": 128},
        "reranking": {"backend": "bge-reranker", "model": "test"},
        "generation": {"backend": "llm-jax", "model": "test",
                       "temperature": 0.0, "scheduler_max_wait_ms": 5},
        "expansion": {"backend": "hyde"},
        "contextual": {"enabled": True, "window_size": 1},
        "tts": {"backend": "null"},
        "chunking": {"min_chunk_tokens": 1, "overlap_tokens": 0},
    }))


@pytest.fixture(scope="module")
def wav(tmp_path_factory):
    d = tmp_path_factory.mktemp("grand")
    rng = np.random.default_rng(0)
    sr = 16000
    # speech-like (harmonic stack + syllabic AM) so the learned VAD — the
    # default gate since round 2 — keeps it; a bare sine would rightly be
    # rejected as a steady tone
    t = np.arange(sr * 6) / sr
    phase = 2 * np.pi * 170.0 * t
    voiced = sum(np.sin(h * phase) / h for h in range(1, 7))
    am = 0.3 + 0.7 * 0.5 * (1 + np.sin(2 * np.pi * 3.5 * t))
    audio = (0.25 * voiced * am / np.abs(voiced).max()
             + 0.02 * rng.standard_normal(sr * 6)).astype(np.float32)
    p = d / "grand.wav"
    write_wav(p, audio, sr)
    return str(p)


def test_full_real_pipeline(rag, wav):
    res = rag.ingest(wav, metadata={"suite": "grand"})
    assert res.num_segments >= 1
    assert res.num_chunks >= 1
    assert res.num_speakers >= 1
    assert "transcribe" in res.stage_timings
    assert "contextualize" in res.stage_timings

    out = rag.query(
        "tok1 tok2", search_type="hybrid", rerank=True,
        use_hyde=True, generate_answer=True, speak_answer=True, top_k=3,
    )
    assert out.results
    assert out.results[0].metadata["suite"] == "grand"
    assert out.expanded_query is not None  # HyDE ran through the real LLM
    assert isinstance(out.answer, str)
    assert out.audio and out.audio[:4] == b"RIFF"
    # contextual headers made it into the indexed text
    assert any("[Context:" in r.text for r in out.results)

    # evaluation harness over the real pipeline
    from audio_rag_tpu.evaluation.dataset import EvalDataset, EvalSample
    from audio_rag_tpu.evaluation.metrics import RAGEvaluator

    ds = EvalDataset("grand", [
        EvalSample("what does tok1 say", "tok words", ["tok"]),
    ])
    ev = RAGEvaluator(embedder=rag._embedder, k=3)
    results = ev.evaluate_dataset(rag, ds, search_types=["hybrid"])
    summary = ev.summarize_results(results)
    assert summary["hybrid"]["n"] == 1
    assert 0.0 <= summary["hybrid"]["precision_at_k"] <= 1.0

    # status reflects all hosted models
    st = rag.status()
    assert {"whisper", "speaker", "bgem3", "reranker", "llm"} <= set(
        st["engine"]["models"]
    )
