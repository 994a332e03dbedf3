"""Full-ingest benchmark: audio → ASR → diarization → alignment →
chunking → embedding → store, end to end on one chip.

Reference baseline (BASELINE.md): FULL ingest at 0.33× real-time on the
reference's GPU stack (ASR stage alone 0.1×) — five services connected by
HTTP. Here the whole pipeline is one process on one chip; every stage's
models share the mesh under the ResourceManager.

Random-init weights with the production architectures (identical FLOPs);
the int8 decode path and single-pass decode match `configs/
production.yaml` and bench_asr.py (see docs/PERFORMANCE.md for why the
temperature-fallback ladder is off under random init).

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline", "extra"}.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

BASELINE_FULL_INGEST_RTF = 0.33  # reference end-to-end ingest
AUDIO_MINUTES = 8.0


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def main() -> None:
    import jax

    import audio_rag_tpu
    from audio_rag_tpu.config.schema import AudioRAGConfig
    from audio_rag_tpu.utils.jax_cache import enable_compilation_cache

    enable_compilation_cache()
    log(f"devices: {jax.devices()}")

    cfg = AudioRAGConfig()
    cfg.asr.backend = "whisper-jax"
    cfg.asr.model_size = "large-v3"
    cfg.asr.compute_type = "bfloat16"
    cfg.asr.window_batch_size = 16
    cfg.asr.cross_kv_int8 = True
    cfg.asr.decoder_int8 = True
    cfg.asr.temperature_fallback = False  # random-init gate artifact
    cfg.asr.vad_filter = False
    cfg.diarization.backend = "clustering"
    cfg.embedding.backend = "bge-m3"
    cfg.retrieval.backend = "tpu"
    cfg.generation.backend = "none"
    cfg.contextual.enabled = False

    from bench_common import make_bench_audio

    rag = audio_rag_tpu.AudioRAG(cfg)
    sr = 16000
    audio = make_bench_audio(AUDIO_MINUTES, sr)

    # warmup: one full ingest of the same clip — the batch-16 window
    # program needs all 16 windows (= the whole 8-min input) to compile
    # the production shape, so the warmup IS a complete first pass
    t0 = time.time()
    rag.ingest(audio, sr, collection="warmup")
    log(f"warmup (compile all stages) {time.time() - t0:.1f}s")

    t0 = time.perf_counter()
    res = rag.ingest(audio, sr, collection="bench")
    elapsed = time.perf_counter() - t0
    rtf = elapsed / (AUDIO_MINUTES * 60.0)
    log(f"{AUDIO_MINUTES:.0f} min in {elapsed:.1f}s → RTF {rtf:.4f} "
        f"({res.num_chunks} chunks, {res.num_speakers} speakers) "
        f"stages={res.stage_timings}")

    print(json.dumps({
        "metric": "full_ingest_rtf",
        "value": round(rtf, 4),
        "unit": "x_realtime",
        "vs_baseline": round(BASELINE_FULL_INGEST_RTF / max(rtf, 1e-9), 2),
        "extra": {
            "baseline_full_ingest_rtf": BASELINE_FULL_INGEST_RTF,
            "audio_minutes": AUDIO_MINUTES,
            "num_chunks": res.num_chunks,
            "stage_timings_s": res.stage_timings,
            "stages": "asr(large-v3 int8 decode) + diarization(clustering)"
                      " + alignment + chunking + embedding(bge-m3) + store",
            "note": "random-init production architectures; one process, "
                    "one chip (reference: five services over HTTP)",
        },
    }))


if __name__ == "__main__":
    sys.exit(main() or 0)
