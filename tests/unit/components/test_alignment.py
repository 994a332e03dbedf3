from audio_rag_tpu.alignment.aligner import (
    align_words_to_speakers,
    build_speaker_transcript,
)
from audio_rag_tpu.core.types import TranscriptSegment, Word


def diar(spans):
    return [
        TranscriptSegment(text="", start=s, end=e, speaker=spk)
        for s, e, spk in spans
    ]


class TestAlign:
    def test_max_overlap_assignment(self):
        words = [Word("a", 0.0, 1.0), Word("b", 4.0, 5.0)]
        d = diar([(0, 3, "S0"), (3, 6, "S1")])
        out = align_words_to_speakers(words, d)
        assert [w.speaker for w in out] == ["S0", "S1"]

    def test_word_straddling_boundary_gets_bigger_overlap(self):
        words = [Word("x", 2.5, 4.5)]  # 0.5s in S0, 1.5s in S1
        d = diar([(0, 3, "S0"), (3, 6, "S1")])
        out = align_words_to_speakers(words, d)
        assert out[0].speaker == "S1"

    def test_nearest_fallback_within_tolerance(self):
        words = [Word("gap", 3.2, 3.4)]  # in the hole, 0.2s from S0's end
        d = diar([(0, 3, "S0"), (5, 8, "S1")])
        out = align_words_to_speakers(words, d)
        assert out[0].speaker == "S0"

    def test_outside_tolerance_propagates(self):
        words = [Word("a", 0.5, 1.0), Word("far", 10.0, 10.5)]
        d = diar([(0, 2, "S0")])
        out = align_words_to_speakers(words, d)
        # "far" is 8s from any segment → propagation fills from "a"
        assert out[1].speaker == "S0"

    def test_empty_diarization_keeps_none(self):
        out = align_words_to_speakers([Word("a", 0, 1)], [])
        assert out[0].speaker is None

    def test_empty_words(self):
        assert align_words_to_speakers([], diar([(0, 1, "S0")])) == []


class TestBuildTranscript:
    def test_split_on_speaker_change(self):
        words = [
            Word("a", 0, 1, speaker="S0"),
            Word("b", 1, 2, speaker="S0"),
            Word("c", 2, 3, speaker="S1"),
        ]
        segs = build_speaker_transcript(words)
        assert len(segs) == 2
        assert segs[0].text == "a b" and segs[0].speaker == "S0"
        assert segs[1].text == "c" and segs[1].speaker == "S1"

    def test_split_on_gap(self):
        words = [
            Word("a", 0, 1, speaker="S0"),
            Word("b", 3.0, 4.0, speaker="S0"),  # 2s gap
        ]
        segs = build_speaker_transcript(words)
        assert len(segs) == 2

    def test_words_carried_into_segments(self):
        words = [Word("a", 0, 1, speaker="S0")]
        segs = build_speaker_transcript(words)
        assert segs[0].words == words
