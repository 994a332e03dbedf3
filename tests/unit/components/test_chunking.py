from audio_rag_tpu.chunking.base import estimate_tokens
from audio_rag_tpu.chunking.fixed import FixedSizeChunker
from audio_rag_tpu.chunking.speaker_turn import SpeakerTurnChunker
from audio_rag_tpu.config.schema import ChunkingConfig
from audio_rag_tpu.core.types import TranscriptSegment


def seg(text, start, end, speaker):
    return TranscriptSegment(text=text, start=start, end=end, speaker=speaker)


class TestSpeakerTurn:
    def test_groups_by_speaker(self):
        c = SpeakerTurnChunker(
            ChunkingConfig(overlap_tokens=0, min_chunk_tokens=1)
        )
        segs = [
            seg("hello there", 0, 2, "S0"),
            seg("more words", 2, 4, "S0"),
            seg("other speaker", 4, 6, "S1"),
        ]
        chunks = c.chunk(segs)
        assert len(chunks) == 2
        assert chunks[0].text == "hello there more words"
        assert chunks[0].speaker == "S0"
        assert chunks[1].speaker == "S1"

    def test_splits_oversized_group(self):
        cfg = ChunkingConfig(max_tokens=50, min_chunk_tokens=1,
                             overlap_tokens=0)
        c = SpeakerTurnChunker(cfg)
        # each segment ~40 tokens (160 chars) → 2 per chunk max is exceeded
        big = "w" * 160
        segs = [seg(big, i, i + 1, "S0") for i in range(4)]
        chunks = c.chunk(segs)
        assert len(chunks) == 4  # every segment alone exceeds half the budget

    def test_merges_small_groups(self):
        cfg = ChunkingConfig(max_tokens=256, min_chunk_tokens=30,
                             overlap_tokens=0)
        c = SpeakerTurnChunker(cfg)
        segs = [seg("tiny", 0, 1, "S0"), seg("also small", 1, 2, "S1")]
        chunks = c.chunk(segs)
        assert len(chunks) == 1  # merged despite speaker change

    def test_overlap_context_prefix(self):
        cfg = ChunkingConfig(max_tokens=64, min_chunk_tokens=1,
                             overlap_tokens=3)
        c = SpeakerTurnChunker(cfg)
        segs = [
            seg("alpha beta gamma delta " * 16, 0, 2, "S0"),
            seg("next chunk text " * 16, 2, 4, "S1"),
        ]
        chunks = c.chunk(segs)
        assert len(chunks) >= 2
        assert chunks[1].text.startswith("[...")
        assert chunks[1].metadata.get("has_context_prefix")

    def test_empty(self):
        assert SpeakerTurnChunker().chunk([]) == []

    def test_timestamps_preserved(self):
        c = SpeakerTurnChunker(ChunkingConfig(overlap_tokens=0))
        chunks = c.chunk([seg("some text here to chunk", 3.5, 9.25, "S0")])
        assert chunks[0].start == 3.5 and chunks[0].end == 9.25


class TestFixed:
    def test_windows_with_overlap(self):
        cfg = ChunkingConfig(max_tokens=50, overlap_tokens=10,
                             min_chunk_tokens=1)
        c = FixedSizeChunker(cfg)
        text = " ".join(f"w{i}" for i in range(100))
        chunks = c.chunk([seg(text, 0, 100, "S0")])
        assert len(chunks) == 3  # 0-50, 40-90, 80-100
        assert chunks[0].text.split()[0] == "w0"
        assert chunks[1].text.split()[0] == "w40"

    def test_majority_speaker(self):
        cfg = ChunkingConfig(max_tokens=100, overlap_tokens=0,
                             min_chunk_tokens=1)
        c = FixedSizeChunker(cfg)
        segs = [
            seg("a b c", 0, 3, "S0"),
            seg("d", 3, 4, "S1"),
        ]
        chunks = c.chunk(segs)
        assert chunks[0].speaker == "S0"

    def test_interpolated_timing(self):
        cfg = ChunkingConfig(max_tokens=100, overlap_tokens=0,
                             min_chunk_tokens=1)
        c = FixedSizeChunker(cfg)
        chunks = c.chunk([seg("a b c d", 0.0, 4.0, "S0")])
        assert chunks[0].start == 0.0 and chunks[0].end == 4.0


def test_estimate_tokens():
    assert estimate_tokens("abcd" * 10) == 10
    assert estimate_tokens("") == 1
