"""Mixed-workload bench: query latency while a full ingest owns the chip.

SURVEY.md "hard parts" names multiplexing query traffic against
long-running ingest without head-of-line blocking. Two mechanisms matter
on one chip:

1. **Model swap thrash** — ingest's contextual stage hosts llama-3.2-3b
   (10.2 GB int8) which LRU-evicts the query path's embedder/reranker;
   every query then pays a multi-second model re-init. Policy fix:
   ``resources.pin_query_models`` exempts them (3.7 GB pinned; llama still
   fits the remaining budget). PIN=0 measures the unpinned baseline.
2. **Dispatch head-of-line** — a dispatched program is not preemptible, so
   a query behind the 16-window transcribe dispatch waits for it. This is
   bounded by the largest single program (~6 s per 8 min of audio), the
   same bound the reference has when Whisper and the embedder share one
   GPU.

Prints ONE JSON line. Run on the real chip: ``python bench_mixed.py``
(PIN=0 for the unpinned A/B).
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time

import numpy as np

AUDIO_MINUTES = 8.0
QUERY_PERIOD_S = 1.5


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def bench_streaming_mixed(n_sessions: int) -> None:
    """Query latency while N REAL-TIME live transcription sessions share
    the chip (``STREAMING=8 python bench_mixed.py``).

    The production multiplexing claim: one chip holds
    ``streaming.max_sessions`` live sessions (chunks every 4 s each,
    muxed into one batched dispatch — see bench_streaming.py
    BENCH_SESSIONS for the saturation numbers) AND serves query traffic
    in the gaps. Sessions are paced at real time, not replayed
    full-speed: the question is query p95 under the duty cycle live
    sessions actually impose (~0.9 s batch per 4 s cadence), not under
    an artificial 100% ASR load.
    """
    import asyncio

    import jax

    import audio_rag_tpu
    from audio_rag_tpu.asr.mux import StreamingMux
    from audio_rag_tpu.asr.streaming import StreamingASR, StreamingConfig
    from audio_rag_tpu.asr.whisper_jax import WhisperJaxASR
    from audio_rag_tpu.audio.synth import speech_like
    from audio_rag_tpu.config.schema import ASRConfig, AudioRAGConfig
    from audio_rag_tpu.utils.jax_cache import enable_compilation_cache

    enable_compilation_cache()
    log(f"devices: {jax.devices()}  sessions: {n_sessions}")

    # query stack: real embedder/reranker/store; ASR seeding via the fake
    # backend (the live sessions are the real-ASR load in this bench)
    cfg = AudioRAGConfig()
    cfg.asr.backend = "fake"
    cfg.diarization.backend = "fake"
    cfg.embedding.backend = "bge-m3"
    cfg.retrieval.backend = "tpu"
    cfg.reranking.backend = "bge-reranker"
    cfg.generation.backend = "fake"
    cfg.contextual.enabled = False
    cfg.resources.pin_query_models = True
    rag = audio_rag_tpu.AudioRAG(cfg)

    sr = 16000
    from bench_common import make_bench_audio

    rag.ingest(make_bench_audio(2.0, sr), sr, collection="bench")
    for _ in range(3):
        rag.query("what is discussed in the lecture", collection="bench")

    # live-session stack: same int8 chunk profile as bench_streaming
    asr_cfg = ASRConfig(
        backend="whisper-jax", model_size="large-v3",
        compute_type="bfloat16", vad_filter=False,
        window_batch_size=16, cross_kv_int8=True, decoder_int8=True,
        temperature_fallback=False, max_decode_tokens=64,
    )
    backend = WhisperJaxASR(asr_cfg)
    mux = StreamingMux(backend, max_batch=max(2, n_sessions))
    stream_cfg = StreamingConfig(chunk_duration=5.0, overlap_duration=1.0)
    mux.ensure_ready(None, sr, stream_cfg.chunk_duration)

    def one_query() -> float:
        t = time.perf_counter()
        rag.query("what is discussed in the lecture", collection="bench")
        return (time.perf_counter() - t) * 1e3

    solo = [one_query() for _ in range(10)]
    solo_p50 = float(np.median(solo))
    log(f"solo query p50 {solo_p50:.0f} ms")

    dur_s = 60
    chunk_ms: list[float] = []

    def run_session(seed: int) -> None:
        # real-time pacing: 0.5 s of audio per 0.5 s of wall clock
        audio = speech_like(dur_s * sr, sr, seed=seed)
        sess = StreamingASR(asr_cfg, stream_cfg, mux=mux)
        sess.load()

        async def drive():
            await sess.start()
            step = sr // 2
            for i in range(0, len(audio), step):
                t0 = time.perf_counter()
                r = await sess.add_audio(audio[i: i + step])
                if r is not None and r.processing_time_ms > 0:
                    chunk_ms.append(r.processing_time_ms)
                dt = time.perf_counter() - t0
                await asyncio.sleep(max(0.0, 0.5 - dt))
            await sess.stop()

        asyncio.run(drive())
        sess._executor.shutdown(wait=True)

    threads = [threading.Thread(target=run_session, args=(i,), daemon=True)
               for i in range(n_sessions)]
    b0, c0 = mux.batches_run, mux.chunks_served
    for t in threads:
        t.start()
    lat: list[float] = []
    while any(t.is_alive() for t in threads):
        lat.append(one_query())
        time.sleep(max(0.0, QUERY_PERIOD_S - lat[-1] / 1e3))
    for t in threads:
        t.join()

    p50 = float(np.median(lat))
    p95 = float(np.percentile(lat, 95))
    batches = mux.batches_run - b0
    chunks = mux.chunks_served - c0
    cp50 = float(np.median(chunk_ms)) if chunk_ms else 0.0
    cp95 = float(np.percentile(chunk_ms, 95)) if chunk_ms else 0.0
    log(f"under {n_sessions} live sessions: {len(lat)} queries "
        f"p50 {p50:.0f} p95 {p95:.0f} ms; chunks p50 {cp50:.0f} "
        f"p95 {cp95:.0f} ms ({chunks} in {batches} dispatches)")
    print(json.dumps({
        "metric": "query_p95_under_streaming_ms",
        "value": round(p95, 1),
        "unit": "ms",
        "vs_baseline": None,
        "extra": {
            "n_sessions": n_sessions,
            "solo_query_p50_ms": round(solo_p50, 1),
            "queries": {"n": len(lat), "p50_ms": round(p50, 1),
                        "p95_ms": round(p95, 1),
                        "max_ms": round(float(np.max(lat)), 1)},
            "chunks": {"n": chunks, "batches": batches,
                       "p50_ms": round(cp50, 1), "p95_ms": round(cp95, 1)},
            "note": "N live sessions paced at REAL TIME (5 s chunks / "
                    "4 s cadence) through the streaming mux while one "
                    "query fires every ~1.5 s; the reference cannot run "
                    "this mix at all (one streaming session owns its GPU "
                    "behind a process lock). Query p95 is bounded by the "
                    "non-preemptible muxed chunk dispatch (~0.9 s at "
                    "B=8).",
        },
    }))
    mux.stop()


def main() -> None:
    import jax

    import audio_rag_tpu
    from audio_rag_tpu.config.schema import AudioRAGConfig
    from audio_rag_tpu.resources.manager import get_resource_manager
    from audio_rag_tpu.utils.jax_cache import enable_compilation_cache

    enable_compilation_cache()
    log(f"devices: {jax.devices()}")

    n_streaming = int(os.environ.get("STREAMING", 0))
    if n_streaming:
        return bench_streaming_mixed(n_streaming)

    pin = os.environ.get("PIN", "1") != "0"
    cfg = AudioRAGConfig()
    cfg.asr.backend = "whisper-jax"
    cfg.asr.model_size = "large-v3"
    cfg.asr.compute_type = "bfloat16"
    cfg.asr.window_batch_size = 16
    cfg.asr.cross_kv_int8 = True
    cfg.asr.decoder_int8 = True
    cfg.asr.temperature_fallback = False
    cfg.asr.vad_filter = False
    cfg.diarization.backend = "clustering"
    cfg.embedding.backend = "bge-m3"
    cfg.retrieval.backend = "tpu"
    cfg.reranking.backend = "bge-reranker"
    cfg.generation.backend = "llm-jax"
    cfg.generation.model = "llama-3.2-3b"
    cfg.generation.decoder_int8 = True
    cfg.generation.use_scheduler = False
    cfg.contextual.enabled = True  # the swap stressor
    cfg.resources.pin_query_models = pin

    from bench_common import make_bench_audio

    rag = audio_rag_tpu.AudioRAG(cfg)
    sr = 16000
    audio = make_bench_audio(AUDIO_MINUTES, sr)

    # warm pass: compile every stage + the query programs
    t0 = time.time()
    rag.ingest(audio, sr, collection="bench")
    log(f"warm ingest {time.time() - t0:.1f}s")
    for _ in range(3):
        rag.query("what is discussed in the lecture", collection="bench")

    def one_query() -> float:
        t = time.perf_counter()
        rag.query("what is discussed in the lecture", collection="bench")
        return (time.perf_counter() - t) * 1e3

    solo = [one_query() for _ in range(10)]
    solo_p50 = float(np.median(solo))
    log(f"solo query p50 {solo_p50:.0f} ms (pin={pin})")

    rm = get_resource_manager()
    ev_before = rm.eviction_count
    t_ing = {}

    def run_ingest():
        t = time.perf_counter()
        rag.ingest(audio, sr, collection="bench2")
        t_ing["s"] = time.perf_counter() - t

    th = threading.Thread(target=run_ingest, daemon=True)
    lat: list[float] = []
    th.start()
    while th.is_alive():
        lat.append(one_query())
        time.sleep(max(0.0, QUERY_PERIOD_S - lat[-1] / 1e3))
    th.join()
    evictions = rm.eviction_count - ev_before

    p50 = float(np.median(lat))
    p95 = float(np.percentile(lat, 95))
    worst = float(np.max(lat))
    log(f"under ingest: {len(lat)} queries p50 {p50:.0f} p95 {p95:.0f} "
        f"max {worst:.0f} ms; ingest {t_ing.get('s', 0):.1f}s; "
        f"evictions {evictions}")

    print(json.dumps({
        "metric": "query_p95_under_ingest_ms",
        "value": round(p95, 1),
        "unit": "ms",
        "vs_baseline": None,
        "extra": {
            "pin_query_models": pin,
            "solo_query_p50_ms": round(solo_p50, 1),
            "under_ingest": {
                "n": len(lat),
                "p50_ms": round(p50, 1),
                "p95_ms": round(p95, 1),
                "max_ms": round(worst, 1),
            },
            "ingest_s_under_load": round(t_ing.get("s", 0.0), 1),
            "evictions_during_run": evictions,
            "note": "8-min ingest (asr+diar+align+chunk+contextual+embed"
                    "+store) in a worker thread; one query every ~1.5 s "
                    "from the main thread. p95 is bounded by the largest "
                    "non-preemptible dispatch (the 16-window transcribe "
                    "program); pinning removes model-reload thrash.",
        },
    }))


if __name__ == "__main__":
    sys.exit(main() or 0)
