"""End-to-end pipeline tests with fake model backends: ingest a WAV, query
it back through dense/sparse/hybrid with reranking — the 'minimum slice'
configs of BASELINE.json exercised without model weights."""

import numpy as np
import pytest

from audio_rag_tpu.audio.io import write_wav
from audio_rag_tpu.config.schema import AudioRAGConfig
from audio_rag_tpu.pipeline.orchestrator import AudioRAG


def fake_config(**overrides) -> AudioRAGConfig:
    base = {
        "asr": {"backend": "fake"},
        "diarization": {"backend": "fake"},
        "embedding": {"backend": "fake"},
        "retrieval": {"backend": "tpu", "capacity_step": 128},
        "reranking": {"backend": "fake"},
        "generation": {"backend": "fake"},
        "expansion": {"backend": "none"},
        "tts": {"backend": "null"},
    }
    for k, v in overrides.items():
        base.setdefault(k, {}).update(v)
    return AudioRAGConfig(**base)


@pytest.fixture
def wav_file(tmp_path):
    sr = 16000
    rng = np.random.default_rng(0)
    audio = 0.1 * rng.standard_normal(sr * 20).astype(np.float32)
    p = tmp_path / "talk.wav"
    write_wav(p, audio, sr)
    return str(p)


@pytest.fixture
def rag():
    return AudioRAG(fake_config())


class TestIngest:
    def test_ingest_produces_chunks(self, rag, wav_file):
        res = rag.ingest(wav_file, metadata={"course": "cs229"})
        assert res.num_chunks > 0
        assert res.num_segments > 0
        assert res.num_speakers >= 1
        assert res.duration_s == pytest.approx(20.0, abs=0.5)
        assert rag._retriever.count() == res.num_chunks

    def test_ingest_no_diarize(self, rag, wav_file):
        res = rag.ingest(wav_file, diarize=False)
        assert res.num_chunks > 0
        assert res.num_speakers == 0

    def test_metadata_stamped(self, rag, wav_file):
        rag.ingest(wav_file, metadata={"course": "cs229"})
        out = rag.query("word0 word1", search_type="dense", rerank=False)
        assert out.results
        assert out.results[0].metadata["course"] == "cs229"
        assert out.results[0].metadata["source"] == wav_file

    def test_ingest_batch(self, rag, wav_file):
        results = rag.ingest_batch([wav_file, wav_file])
        assert len(results) == 2


class TestQuery:
    @pytest.fixture(autouse=True)
    def _ingested(self, rag, wav_file):
        rag.ingest(wav_file)

    @pytest.mark.parametrize("stype", ["dense", "sparse", "hybrid"])
    def test_search_types(self, rag, stype):
        out = rag.query("word0 word1 word2", search_type=stype, rerank=False)
        assert out.results
        assert out.response

    def test_rerank_path(self, rag):
        out = rag.query("word5 word6", search_type="hybrid", rerank=True,
                        top_k=2)
        assert len(out.results) <= 2
        assert "rerank" in out.stage_timings or len(out.results) <= 2

    def test_generate_answer(self, rag):
        out = rag.query("word0", generate_answer=True)
        assert out.answer and "fake answer" in out.answer

    def test_speak_answer(self, rag):
        out = rag.query("word0", generate_answer=True, speak_answer=True)
        assert out.audio is not None
        assert out.audio[:4] == b"RIFF"

    def test_get_context_xml(self, rag):
        ctx = rag.get_context("word0")
        assert ctx.startswith("<context>") and ctx.endswith("</context>")

    def test_response_format(self, rag):
        out = rag.query("word0", rerank=False)
        assert "at 0" in out.response or "[SPEAKER" in out.response


class TestStatusAndManagement:
    def test_status(self, rag, wav_file):
        rag.ingest(wav_file)
        st = rag.status()
        assert st["config"]["asr"] == "fake"
        assert st["collections"]["audio_rag"] > 0
        assert "engine" in st and "resources" in st

    def test_clear_collection(self, rag, wav_file):
        rag.ingest(wav_file)
        assert rag.clear_collection()
        assert rag._retriever.count() == 0


class TestContextualIngest:
    def test_contextual_headers_added(self, wav_file):
        rag = AudioRAG(fake_config(contextual={"enabled": True}))
        rag.ingest(wav_file)
        out = rag.query("word0", rerank=False)
        assert any(
            r.text.startswith("[Context:") for r in out.results
        )
        ctxed = [r for r in out.results if r.metadata.get("contextualized")]
        assert ctxed and "original_text" in ctxed[0].metadata

    def test_staged_batch_matches_per_file_loop(self, wav_file, tmp_path):
        """Stage-grouped ingest_batch (contextual on: audio stages for all
        files, then all headers, then embed+store) must produce the same
        chunks/headers/store contents as the naive per-file loop — the
        grouping only reorders MODEL residency, not data flow."""
        import shutil

        wav2 = str(tmp_path / "two.wav")
        shutil.copy(wav_file, wav2)
        files = [wav_file, wav2]

        rag_a = AudioRAG(fake_config(contextual={"enabled": True}))
        res_a = rag_a.ingest_batch(files, collection="staged")
        rag_b = AudioRAG(fake_config(contextual={"enabled": True}))
        res_b = [rag_b.ingest(f, collection="perfile") for f in files]

        assert [r.num_chunks for r in res_a] == [r.num_chunks for r in res_b]
        assert [r.num_segments for r in res_a] == [
            r.num_segments for r in res_b]
        out_a = rag_a.query("word0", collection="staged", rerank=False)
        out_b = rag_b.query("word0", collection="perfile", rerank=False)
        assert [r.text for r in out_a.results] == [
            r.text for r in out_b.results]
        assert any(r.text.startswith("[Context:") for r in out_a.results)
        # source metadata stamped per file in both
        assert {r.metadata["source"] for r in out_a.results} <= set(files)
