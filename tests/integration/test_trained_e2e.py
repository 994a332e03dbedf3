"""The all-trained-assets pipeline: audio in → meaningful answers out.

The reference's end-to-end story runs on downloaded weights (Whisper,
titanet, BGE-M3, ollama). This test is the zero-egress counterpart on
COMMITTED trained assets only: charvoice speech → trained tiny Whisper
(`asr_tiny_synth.npz`) → clustering diarization (trained speaker
encoder) → alignment → chunking → trained eval-small embedder →
HBM store → hybrid retrieval finds the chunk whose SPOKEN words match
the query. No fake backends anywhere in the audio→retrieval path."""

from pathlib import Path

import numpy as np
import pytest

ASSETS = Path(__file__).resolve().parents[2] / "audio_rag_tpu" / "assets"

pytestmark = pytest.mark.skipif(
    not (ASSETS / "asr_tiny_synth.npz").exists(),
    reason="trained ASR asset not built",
)


@pytest.fixture(scope="module")
def rag(tmp_path_factory):
    from audio_rag_tpu.config.schema import AudioRAGConfig
    from audio_rag_tpu.pipeline.orchestrator import AudioRAG

    rag = AudioRAG(AudioRAGConfig(**{
        "asr": {"backend": "whisper-jax", "model_size": "tiny-synth",
                "compute_type": "float32", "vad_filter": False,
                "temperature_fallback": False},
        "diarization": {"backend": "clustering", "max_speakers": 2},
        "embedding": {"backend": "bge-m3", "model": "eval-small"},
        "retrieval": {"backend": "tpu", "capacity_step": 128},
        "reranking": {"backend": "none"},
        "generation": {"backend": "none"},
        "tts": {"backend": "null"},
        "chunking": {"min_chunk_tokens": 1, "overlap_tokens": 0},
    }))
    yield rag
    rag.unload_all()


def _speak_turns(turns, rng):
    """Alternate-speaker audio: each (text, f0_shift) turn rendered in
    the charvoice with a per-speaker pitch shift and a gap between."""
    from audio_rag_tpu.audio.charvoice import SR, synth_text

    pieces = []
    spans = []
    t = 0.3
    pieces.append(np.zeros(int(0.3 * SR), np.float32))
    for text, _spk in turns:
        wav = synth_text(text, rng, noise_level=0.005)
        spans.append((t, t + wav.size / SR, text))
        pieces.append(wav)
        gap = np.zeros(int(0.5 * SR), np.float32)
        pieces.append(gap)
        t += wav.size / SR + 0.5
    return np.concatenate(pieces), spans


class TestTrainedEndToEnd:
    def test_spoken_content_is_retrievable(self, rag, tmp_path):
        from audio_rag_tpu.audio.charvoice import SR
        from audio_rag_tpu.audio.io import write_wav

        rng = np.random.default_rng(7)
        turns = [
            ("gradient descent minimizes the loss function", 0),
            ("the spectrogram shows harmonic structure", 1),
            ("attention layers mix token information", 0),
        ]
        audio, spans = _speak_turns(turns, rng)
        wav_path = tmp_path / "lecture.wav"
        write_wav(wav_path, audio, SR)

        res = rag.ingest(str(wav_path), collection="trained_e2e")
        assert res.num_chunks >= 1

        out = rag.query("gradient descent loss", top_k=2,
                        search_type="hybrid", collection="trained_e2e")
        assert out.results
        top = out.results[0].text
        assert "gradient" in top or "descent" in top, top

        out2 = rag.query("spectrogram harmonic", top_k=2,
                         search_type="hybrid", collection="trained_e2e")
        assert out2.results
        assert "spectrogram" in out2.results[0].text \
            or "harmonic" in out2.results[0].text, out2.results[0].text

    def test_streaming_with_trained_asr(self):
        """Live-transcription path on the trained model: chunked
        streaming through StreamingASR produces the spoken words."""
        from audio_rag_tpu.asr.streaming import StreamingASR, StreamingConfig
        from audio_rag_tpu.audio.charvoice import SR, synth_text
        from audio_rag_tpu.config.schema import ASRConfig

        stream = StreamingASR(
            ASRConfig(model_size="tiny-synth", compute_type="float32",
                      vad_filter=False, temperature_fallback=False),
            StreamingConfig(chunk_duration=4.0, overlap_duration=0.5,
                            max_decode_tokens=112),
        )
        stream.load()
        try:
            rng = np.random.default_rng(3)
            wav = synth_text("the model learns fast and stops", rng,
                             noise_level=0.005)
            results = list(stream.process_stream(wav, SR))
            text = " ".join(r.text for r in results if r.text)
            hits = sum(w in text for w in
                       ("model", "learns", "fast", "stops"))
            assert hits >= 3, text
        finally:
            stream.unload()
