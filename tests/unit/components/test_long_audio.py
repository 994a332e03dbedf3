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
    keys_before = set(asr._engine._programs)
    segs = asr.transcribe(audio, SR)
    new_keys = set(asr._engine._programs) - keys_before
    # coverage: segments span (nearly) the whole file duration
    assert segs, "expected transcript segments"
    assert max(s.end for s in segs) > (n_windows - 1) * window_s
    # bounded compile variants: the tail batch PADS to the full batch size
    # (a partial-B shape would cost a fresh ~350 s trace of the unrolled
    # transcribe program per process), so a multi-batch file compiles
    # exactly ONE transcribe shape (other suites may have compiled their
    # own shapes on the shared engine — only THIS call's keys count)
    new_transcribe = [
        k for k in new_keys if k[:2] == ("whisper", "transcribe")
    ]
    assert {k[4] for k in new_transcribe} <= {4}, new_transcribe
    assert len(new_keys) <= 2


def test_tail_batch_padding_matches_unpadded(asr):
    """A 5-window file (batch 4 + tail 1) transcribes identically whether
    the tail row rides in a padded full batch or its own partial batch."""
    window_s = 2 * asr.dims.n_audio_ctx * 160 / SR
    audio = speech_like(int(5 * window_s * SR), SR, seed=3)
    padded = asr.transcribe(audio, SR)
    # force the old unpadded behavior for the tail batch
    windows_gt_bs = len(padded)  # noqa: F841 — readability anchor
    orig = asr._transcribe_batch
    try:
        asr_transcribe_batch = (
            lambda ws, lang, **kw: orig(
                ws, lang, **{**kw, "pad_to": None})
        )
        asr._transcribe_batch = asr_transcribe_batch
        unpadded = asr.transcribe(audio, SR)
    finally:
        asr._transcribe_batch = orig
    assert [(s.text, s.start, s.end) for s in padded] == \
           [(s.text, s.start, s.end) for s in unpadded]


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
