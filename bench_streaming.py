"""Streaming ASR latency sweep: chunk duration vs perceived latency.

The reference streams 5 s chunks with 1 s overlap and 0.5-1.5 s per-chunk
processing (reference ``asr/streaming.py:30-36,292-297``) — it cannot
shrink the chunk because processing would dominate. This build processes a
chunk in ~0.4 s (int8 decode path), so the buffer IS the latency: sweeping
chunk duration down converts the processing headroom into perceived
latency (first-word worst case ≈ chunk + processing).

All chunk durations share ONE compiled transcribe program (every chunk
pads to the model's 30 s window), so the sweep costs one compile total.

Prints ONE JSON line. Run on the real chip: ``python bench_streaming.py``.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

BASELINE_PROCESSING_MS = (500, 1500)  # reference per-chunk range
BASELINE_E2E_S = (5.0, 7.0)  # reference perceived latency (5 s buffer)

SWEEP = [  # (chunk_s, overlap_s) — overlap kept proportional (20%)
    (5.0, 1.0),
    (3.0, 0.6),
    (2.0, 0.4),
]


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def main() -> None:
    import jax

    from audio_rag_tpu.asr.streaming import StreamingASR, StreamingConfig
    from audio_rag_tpu.config.schema import ASRConfig
    from audio_rag_tpu.utils.jax_cache import enable_compilation_cache

    enable_compilation_cache()
    log(f"devices: {jax.devices()}")

    import os

    # streaming decodes ONE window per chunk (B=1) — the regime where
    # speculative block decode pays (docs/PERFORMANCE.md LLM A/B)
    spec_k = int(os.environ.get("BENCH_SPEC_K", 0))

    from audio_rag_tpu.audio.synth import speech_like

    sr = 16000
    audio = speech_like(90 * sr, sr, seed=0)

    rows = []
    backend = None
    for chunk_s, overlap_s in SWEEP:
        asr = StreamingASR(
            ASRConfig(
                backend="whisper-jax", model_size="large-v3",
                compute_type="bfloat16", vad_filter=False,
                window_batch_size=16, cross_kv_int8=True,
                decoder_int8=True, temperature_fallback=False,
                speculative_k=spec_k,
            ),
            StreamingConfig(chunk_duration=chunk_s,
                            overlap_duration=overlap_s),
            backend=backend,  # share the loaded model + programs
        )
        asr.load()
        backend = asr.backend
        t0 = time.time()
        results = list(asr.process_stream(audio, sr))
        wall = time.time() - t0
        times = [r.processing_time_ms for r in results
                 if r.processing_time_ms > 0]
        # drop the first chunk (pays any residual warmup)
        steady = times[1:] if len(times) > 2 else times
        p50 = float(np.median(steady))
        p90 = float(np.percentile(steady, 90))
        # perceived latency for the FIRST word of a chunk: it was spoken
        # chunk_s before the buffer filled, then waited p50 processing
        e2e_first = chunk_s + p50 / 1e3
        # for the LAST word: just the processing time
        e2e_last = p50 / 1e3
        n_words = sum(len(r.words) for r in results)
        rows.append({
            "chunk_s": chunk_s, "overlap_s": overlap_s,
            "chunks": len(times),
            "processing_p50_ms": round(p50, 1),
            "processing_p90_ms": round(p90, 1),
            "e2e_first_word_s": round(e2e_first, 2),
            "e2e_last_word_s": round(e2e_last, 2),
            "words": n_words,
            "wall_s": round(wall, 1),
        })
        log(f"chunk {chunk_s}s/{overlap_s}s: p50 {p50:.0f} ms p90 "
            f"{p90:.0f} ms e2e_first {e2e_first:.2f}s words {n_words}")
        # keep the shared backend loaded for the next config
        asr.backend = None  # prevent unload of the shared backend
        asr._executor.shutdown(wait=True)

    best = min(rows, key=lambda r: r["e2e_first_word_s"])
    print(json.dumps({
        "metric": "streaming_e2e_first_word_s",
        "value": best["e2e_first_word_s"],
        "unit": "s",
        "vs_baseline": round(BASELINE_E2E_S[0] / best["e2e_first_word_s"],
                             2),
        "extra": {
            "baseline_processing_ms": list(BASELINE_PROCESSING_MS),
            "baseline_e2e_s": list(BASELINE_E2E_S),
            "speculative_k": spec_k,
            "sweep": rows,
            "note": "int8 production decode profile (cross_kv_int8 + "
                    "decoder_int8); all chunk sizes share one compiled "
                    "program (chunks pad to the 30 s model window); "
                    "reference cannot shrink its 5 s chunk because "
                    "processing is 0.5-1.5 s",
        },
    }))


if __name__ == "__main__":
    sys.exit(main() or 0)
