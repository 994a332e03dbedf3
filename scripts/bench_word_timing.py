"""Decompose transcribe_with_words vs transcribe on the real chip:
where do the extra seconds go (align dispatch, weight readback, DTW)?

Findings of record (8-min clip, large-v3 int8, v5e via relay):
pre-optimization words 5.7 s vs plain 3.1 s — 2.25 s host DTW+median
(numpy) + 1.5-1.9 s align dispatch + 25 MB fp32 weight readback. After
the native C kernels (arag_dtw_path / arag_median_filter) and the fp16
readback: host share 0.35 s; remainder is the align dispatch through
the relay.

Run: python scripts/bench_word_timing.py
"""

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from audio_rag_tpu.asr.whisper_jax import WhisperJaxASR
from audio_rag_tpu.config.schema import ASRConfig
from audio_rag_tpu.utils.jax_cache import enable_compilation_cache
from bench_common import make_bench_audio

enable_compilation_cache()

asr = WhisperJaxASR(ASRConfig(
    model_size="large-v3", compute_type="bfloat16", vad_filter=False,
    window_batch_size=16, cross_kv_int8=True, decoder_int8=True,
    temperature_fallback=False))
asr.load()
audio = make_bench_audio(8.0)

# warm both paths
asr.transcribe(audio, 16000)
asr.transcribe_with_words(audio, 16000)

for name, fn in (("plain", asr.transcribe),
                 ("words", asr.transcribe_with_words)):
    ts = []
    for _ in range(3):
        t = time.perf_counter()
        fn(audio, 16000)
        ts.append(time.perf_counter() - t)
    print(f"{name}: {min(ts):.2f}s (runs {[round(t, 2) for t in ts]})",
          flush=True)

# instrument _collect_cross_weights: dispatch+readback split
orig = asr._collect_cross_weights
import jax


def timed_collect(enc_dev, prompt, clean):
    t0 = time.perf_counter()
    out = orig(enc_dev, prompt, clean)
    print(f"  collect_cross_weights total {time.perf_counter() - t0:.2f}s "
          f"shape={None if out is None else out.shape} "
          f"dtype={None if out is None else out.dtype}", flush=True)
    return out


asr._collect_cross_weights = timed_collect
t = time.perf_counter()
asr.transcribe_with_words(audio, 16000)
print(f"words (instrumented): {time.perf_counter() - t:.2f}s", flush=True)

# DTW host share
from audio_rag_tpu.asr import word_timing
orig_dtw = word_timing.attention_to_word_times
acc = [0.0]


def timed_attn(*a, **k):
    t0 = time.perf_counter()
    out = orig_dtw(*a, **k)
    acc[0] += time.perf_counter() - t0
    return out


word_timing.attention_to_word_times = timed_attn
import audio_rag_tpu.asr.whisper_jax as wj
t = time.perf_counter()
asr.transcribe_with_words(audio, 16000)
print(f"words run {time.perf_counter() - t:.2f}s, "
      f"host DTW+times {acc[0]:.2f}s", flush=True)
