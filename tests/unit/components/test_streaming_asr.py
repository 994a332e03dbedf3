"""Streaming ASR wrapper over the real (tiny) whisper backend: chunk
cadence, absolute-time bookkeeping, the capped decode budget, and the
learned-VAD silence gate."""

import numpy as np
import pytest

from audio_rag_tpu.asr.streaming import StreamingASR, StreamingConfig
from audio_rag_tpu.audio.synth import speech_like
from audio_rag_tpu.config.schema import ASRConfig

SR = 16000


@pytest.fixture(scope="module")
def asr():
    s = StreamingASR(
        ASRConfig(model_size="test", compute_type="float32",
                  temperature_fallback=False),
        StreamingConfig(chunk_duration=2.0, overlap_duration=0.5,
                        max_decode_tokens=8),
    )
    s.load()
    yield s
    s.unload()


def test_decode_budget_capped(asr):
    # the wrapper must thread the streaming budget into the backend config
    assert asr.backend.config.max_decode_tokens == 8
    assert asr.backend._max_new() <= 8


def test_chunks_flow_with_absolute_times(asr):
    audio = speech_like(SR * 5, SR, seed=0)
    results = list(asr.process_stream(audio, SR))
    assert results, "expected at least one chunk result"
    # chunk boundaries are absolute within the stream and non-overlapping
    # beyond the configured overlap
    for r in results:
        assert r.end > r.start >= 0.0
    starts = [r.start for r in results]
    assert starts == sorted(starts)
    assert results[-1].is_final


def test_silent_chunks_produce_empty_text(asr):
    audio = np.zeros(SR * 3, np.float32)
    results = list(asr.process_stream(audio, SR))
    assert all(not r.text for r in results)
