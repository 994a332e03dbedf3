"""Hour-scale ingest path: windows stream through fixed-size device
batches (bounded compile variants, bounded device memory) and cover the
whole file; the window batches shard over the mesh's data axis."""

import numpy as np
import pytest

from audio_rag_tpu.asr.whisper_jax import WhisperJaxASR
from audio_rag_tpu.audio.synth import speech_like
from audio_rag_tpu.config.schema import ASRConfig

SR = 16000


@pytest.fixture(scope="module")
def asr():
    a = WhisperJaxASR(ASRConfig(
        model_size="test", compute_type="float32", vad_filter=False,
        temperature_fallback=False, window_batch_size=4,
    ))
    a.load()
    yield a
    a.unload()


def test_many_windows_stream_in_bounded_batches(asr):
    window_s = 2 * asr.dims.n_audio_ctx * 160 / SR
    n_windows = 21  # not a multiple of the batch: exercises the tail batch
    audio = speech_like(int(n_windows * window_s * SR), SR, seed=0)
    programs_before = len(asr._engine._programs)
    segs = asr.transcribe(audio, SR)
    programs_after = len(asr._engine._programs)
    # coverage: segments span (nearly) the whole file duration
    assert segs, "expected transcript segments"
    assert max(s.end for s in segs) > (n_windows - 1) * window_s
    # bounded compile variants: full batches share ONE program; only the
    # tail batch (size 1) adds a second — not one per window
    assert programs_after - programs_before <= 3


def test_window_offsets_are_absolute(asr):
    """Every segment's start lies inside its window's absolute span (which
    window produces text is weight-dependent, but offsets must be
    file-relative, never chunk-relative)."""
    window_s = 2 * asr.dims.n_audio_ctx * 160 / SR
    audio = speech_like(int(6 * window_s * SR), SR, seed=1)
    segs = asr.transcribe(audio, SR)
    starts = [s.start for s in segs]
    assert starts == sorted(starts)
    total = len(audio) / SR
    for s in segs:
        assert 0.0 <= s.start <= s.end <= total + window_s
