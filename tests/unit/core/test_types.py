import numpy as np
import pytest

from audio_rag_tpu.core.types import (
    AudioChunk,
    EmbeddingResult,
    RetrievalResult,
    SparseVector,
    TranscriptSegment,
    Word,
)


class TestWord:
    def test_roundtrip(self):
        w = Word("hello", 0.5, 0.9, 0.99, "SPEAKER_00")
        assert Word.from_dict(w.to_dict()) == w
        assert w.duration == pytest.approx(0.4)


class TestTranscriptSegment:
    def test_roundtrip_with_words(self):
        seg = TranscriptSegment(
            "hi there", 0.0, 1.0, speaker="SPEAKER_01",
            words=[Word("hi", 0.0, 0.4), Word("there", 0.5, 1.0)],
        )
        back = TranscriptSegment.from_dict(seg.to_dict())
        assert back.text == "hi there"
        assert len(back.words) == 2
        assert back.words[1].text == "there"


class TestSparseVector:
    def test_from_dict_sorted(self):
        sv = SparseVector.from_dict({30: 0.5, 10: 1.5, 20: 0.25})
        assert sv.indices.tolist() == [10, 20, 30]
        assert sv.values.tolist() == [1.5, 0.25, 0.5]
        assert sv.nnz == 3

    def test_dedup_keeps_max(self):
        sv = SparseVector([5, 5, 7], [0.1, 0.9, 0.3])
        assert sv.to_dict() == {5: pytest.approx(0.9), 7: pytest.approx(0.3)}

    def test_dot(self):
        a = SparseVector.from_dict({1: 2.0, 3: 1.0})
        b = SparseVector.from_dict({3: 4.0, 5: 1.0})
        assert a.dot(b) == pytest.approx(4.0)
        assert a.dot(SparseVector()) == 0.0

    def test_get_and_getitem(self):
        sv = SparseVector.from_dict({42: 1.25})
        assert sv[42] == pytest.approx(1.25)
        assert sv.get(41) == 0.0
        with pytest.raises(KeyError):
            _ = sv[41]

    def test_mismatched_lengths(self):
        with pytest.raises(ValueError):
            SparseVector([1, 2], [1.0])

    def test_empty_falsy(self):
        assert not SparseVector()
        assert SparseVector([1], [1.0])


class TestEmbeddingResult:
    def test_dim(self):
        r = EmbeddingResult(dense=np.zeros(1024, np.float32))
        assert r.dim == 1024
        assert EmbeddingResult().dim == 0


class TestRetrievalResult:
    def test_roundtrip(self):
        r = RetrievalResult("text", 0.9, 1.0, 2.0, "S0", "c1", {"k": "v"})
        assert RetrievalResult.from_dict(r.to_dict()) == r


class TestAudioChunk:
    def test_roundtrip(self):
        c = AudioChunk("t", 0.0, 5.0, "S0", "id", {"source": "x.wav"})
        assert AudioChunk.from_dict(c.to_dict()) == c
