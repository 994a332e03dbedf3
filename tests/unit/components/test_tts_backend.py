"""JaxTTS backend tests: the runnable neural TTS replacing the reference's
piper/edge-tts engines (reference ``tts/piper.py:73-143``,
``tts/edge.py:64-108``) — including the trained-asset spectral-identity
gate and the pipeline fallback chain.
"""

import io
import wave
from pathlib import Path

import numpy as np
import pytest

from audio_rag_tpu.config.schema import TTSConfig
from audio_rag_tpu.core.exceptions import TTSError
from audio_rag_tpu.tts.base import TTSRegistry, create_tts
from audio_rag_tpu.tts.jax_tts import JaxTTS, _split_segments

ASSET = (Path(__file__).resolve().parents[3] / "audio_rag_tpu" / "assets"
         / "tts_small.npz")


def _decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    with wave.open(io.BytesIO(data)) as wf:
        sr = wf.getframerate()
        pcm = np.frombuffer(wf.readframes(wf.getnframes()), "<i2")
    return pcm.astype(np.float32) / 32767.0, sr


@pytest.fixture(scope="module")
def tts():
    backend = JaxTTS(TTSConfig(backend="jax", sample_rate=16000))
    backend.load()
    return backend


def test_registered_and_creatable():
    assert "jax" in TTSRegistry.list()
    backend = create_tts(TTSConfig(backend="jax"))
    assert isinstance(backend, JaxTTS)


def test_split_segments_respects_boundaries():
    segs = _split_segments("First sentence. Second one!  Third?", 64)
    assert segs == ["First sentence.", "Second one!", "Third?"]
    long = "word " * 30
    segs = _split_segments(long, 32)
    assert all(len(s) <= 32 for s in segs)
    assert " ".join(segs).split() == long.split()


def test_synthesize_returns_valid_wav(tts, tmp_path):
    out = tmp_path / "a.wav"
    data = tts.synthesize("hello world", output_path=str(out))
    pcm, sr = _decode_wav(data)
    assert sr == 16000
    assert pcm.size > 1000 and np.max(np.abs(pcm)) > 0.01
    assert out.read_bytes() == data


def test_duration_scales_with_text(tts):
    short, _ = _decode_wav(tts.synthesize("hi"))
    long, _ = _decode_wav(tts.synthesize(
        "this is a much longer sentence with many more words in it"))
    assert long.size > 2 * short.size


def test_empty_text_raises(tts):
    with pytest.raises(TTSError):
        tts.synthesize("   ")


def test_resampling_to_config_rate():
    backend = JaxTTS(TTSConfig(backend="jax", sample_rate=22050))
    backend.load()
    pcm, sr = _decode_wav(backend.synthesize("ok"))
    assert sr == 22050


def test_unload_reload(tts):
    backend = JaxTTS(TTSConfig(backend="jax"))
    backend.load()
    assert backend.is_loaded
    backend.unload()
    assert not backend.is_loaded
    backend.load()
    assert backend.is_loaded


@pytest.mark.skipif(not ASSET.exists(), reason="trained asset not built")
class TestTrainedVoice:
    """Gates on the committed charvoice asset (scripts/train_tts.py)."""

    def test_vowel_spectral_identity(self, tts):
        """Synthesizing lone vowels lands energy at each vowel's band —
        the per-character-faithfulness proxy for intelligibility."""
        # the charvoice band table (scripts/train_tts.py char_band)
        def char_band(c: str) -> float:
            return 450.0 + 220.0 * "aeiou".index(c)

        sr = 16000
        peaks = {}
        for c in "aeiou":
            pcm, _ = _decode_wav(tts.synthesize(c))
            spec = np.abs(np.fft.rfft(pcm * np.hanning(pcm.size)))
            freqs = np.fft.rfftfreq(pcm.size, 1 / sr)
            # dominant frequency within a factor-2 band of the target
            peaks[c] = freqs[int(np.argmax(spec))]
        hits = sum(
            0.4 * char_band(c) <= peaks[c] <= 2.5 * char_band(c)
            for c in "aeiou"
        )
        assert hits >= 4, peaks

    def test_durations_track_teacher_classes(self, tts):
        """Vowels (9 frames) synthesize longer than consonants (5)."""
        v, _ = _decode_wav(tts.synthesize("aaaaaaaa"))
        k, _ = _decode_wav(tts.synthesize("tttttttt"))
        assert v.size > k.size

    def test_deterministic(self, tts):
        a = tts.synthesize("determinism check")
        b = tts.synthesize("determinism check")
        assert a == b


def test_pipeline_fallback_to_jax(monkeypatch):
    """backend=piper (binary absent) degrades to fallback_backend=jax."""
    from audio_rag_tpu.config.schema import AudioRAGConfig
    from audio_rag_tpu.pipeline.query import QueryPipeline

    cfg = AudioRAGConfig()
    cfg.tts.backend = "piper"
    cfg.tts.fallback_backend = "jax"
    pipe = QueryPipeline.__new__(QueryPipeline)
    pipe.config = cfg
    pipe._tts = None
    pipe._tts_built = False
    backend = pipe.tts
    # piper may be importable in some environments; accept either engine,
    # but never None — the fallback chain must produce a working backend
    assert backend is not None
    assert backend.is_loaded
