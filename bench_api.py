"""API serving bench: concurrent HTTP queries through the real server.

bench.py measures the ENGINE's throughput (direct query_batch calls);
this measures the full serving stack — asyncio HTTP server, auth, rate
limiting, JSON (de)serialization, and the query COALESCER
(engine/query_coalescer.py) that merges concurrent requests into fused
device batches. The A/B is the coalescer itself: COALESCE=0 serves each
request with its own device dispatch through the FIFO executor, which is
the reference's architecture shape (one query, one model-server round
trip per stage).

Real models (bge-m3 + cross-encoder, random init), 10k-chunk corpus,
real sockets on loopback. Prints ONE JSON line.

Usage: python bench_api.py            # coalescing on (production default)
       COALESCE=0 python bench_api.py # per-request dispatch A/B
"""

from __future__ import annotations

import asyncio
import concurrent.futures as cf
import json
import os
import sys
import threading
import time

import numpy as np

PORT = 8787
BASE = f"http://127.0.0.1:{PORT}"
KEY = {"X-API-Key": "bench-key"}
CONCURRENCY = 32
N_REQUESTS = 256
BASELINE_QPS = 7.1  # reference search+rerank throughput, one stream


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def main() -> None:
    import httpx

    from audio_rag_tpu.api.app import create_app
    from audio_rag_tpu.api.config import APIConfig
    from audio_rag_tpu.config.schema import AudioRAGConfig
    from audio_rag_tpu.jobqueue.config import QueueConfig, StorageConfig
    from audio_rag_tpu.jobqueue.queue import AudioRAGQueue
    from audio_rag_tpu.jobqueue.store import JobStore
    from audio_rag_tpu.pipeline.orchestrator import AudioRAG
    from audio_rag_tpu.utils.jax_cache import enable_compilation_cache

    enable_compilation_cache()
    coalesce = os.environ.get("COALESCE", "1") != "0"

    cfg = AudioRAGConfig()
    cfg.asr.backend = "fake"
    cfg.diarization.backend = "fake"
    cfg.generation.backend = "none"
    cfg.tts.backend = "null"
    rag = AudioRAG(cfg)
    embedder = rag._embedder
    embedder.load()
    store = rag._retriever

    from bench import CORPUS_SIZE, build_corpus

    rng = np.random.default_rng(0)
    t0 = time.time()
    build_corpus(store, embedder, rng)
    log(f"corpus: {CORPUS_SIZE} chunks in {time.time() - t0:.0f}s")

    queue = AudioRAGQueue(
        QueueConfig(storage=StorageConfig(db_path=":memory:")),
        store=JobStore(":memory:"),
    )
    api_cfg = APIConfig(queue_db_path=":memory:",
                        coalesce_queries=coalesce)
    # unthrottled bench tier: the dev tiers rate-limit far below the
    # server's capacity (premium = 600 queries/min), which is exactly
    # what this bench is trying to measure past
    from audio_rag_tpu.api.config import RateLimitTier

    api_cfg.tiers["bench"] = RateLimitTier(
        query_per_minute=1_000_000, ingest_per_hour=1_000_000,
        status_per_minute=1_000_000)
    api_cfg.api_keys["bench-key"] = {"tenant_id": "bench", "tier": "bench"}
    app = create_app(api_cfg, rag=rag, queue=queue)

    loop = asyncio.new_event_loop()
    stop = threading.Event()

    async def _serve():
        srv = await asyncio.start_server(app._handle_conn, "127.0.0.1", PORT)
        async with srv:
            while not stop.is_set():
                await asyncio.sleep(0.1)

    threading.Thread(
        target=lambda: loop.run_until_complete(_serve()), daemon=True
    ).start()
    for _ in range(100):
        try:
            httpx.get(f"{BASE}/health/live", timeout=1.0)
            break
        except Exception:
            time.sleep(0.1)

    words = [f"term{i}" for i in range(2000)]

    def q(i):
        return " ".join(
            np.random.default_rng(i).choice(words, size=6).tolist())

    def ask(client, i, timeout=120.0):
        r = client.post(f"{BASE}/api/v1/query", headers=KEY,
                        json={"query": q(i), "top_k": 5,
                              "search_type": "hybrid"},
                        timeout=timeout)
        r.raise_for_status()
        return r

    # warm every pow-2 coalesce bucket the burst can produce (1..32):
    # sequential singles warm B=1; a concurrent burst warms the larger
    # buckets (each bucket is one compile, cached persistently)
    with httpx.Client() as client:
        for i in range(3):
            ask(client, 9000 + i)
    for burst in (2, 4, 8, 16, 32):
        with cf.ThreadPoolExecutor(max_workers=burst) as pool, \
                httpx.Client() as client:
            list(pool.map(lambda i: ask(client, 8000 + i), range(burst)))
        log(f"warm burst {burst} done")

    # single-stream p50 through the full HTTP stack
    lat = []
    with httpx.Client() as client:
        for i in range(20):
            t1 = time.perf_counter()
            ask(client, 7000 + i)
            lat.append(time.perf_counter() - t1)
    single_p50 = float(np.percentile(lat, 50) * 1000)
    log(f"single-stream p50 {single_p50:.0f}ms")

    # concurrent load: N requests, C workers, each with its own client
    def worker(idxs, out):
        with httpx.Client() as client:
            for i in idxs:
                t1 = time.perf_counter()
                ask(client, i)
                out.append(time.perf_counter() - t1)

    lats: list[float] = []
    chunks = [list(range(k, N_REQUESTS, CONCURRENCY))
              for k in range(CONCURRENCY)]
    outs = [[] for _ in chunks]
    t0 = time.perf_counter()
    threads = [threading.Thread(target=worker, args=(c, o))
               for c, o in zip(chunks, outs)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0
    for o in outs:
        lats.extend(o)
    qps = N_REQUESTS / wall
    p50 = float(np.percentile(lats, 50) * 1000)
    p95 = float(np.percentile(lats, 95) * 1000)

    c = app.state.get("query_coalescer")
    batches = getattr(c, "batches_run", None)
    served = getattr(c, "requests_served", None)
    log(f"concurrent: {qps:.1f} QPS p50 {p50:.0f}ms p95 {p95:.0f}ms "
        f"(coalesce={coalesce}, batches={batches}, served={served})")
    stop.set()

    print(json.dumps({
        "metric": "api_concurrent_qps",
        "value": round(qps, 1),
        "unit": "qps",
        "vs_baseline": round(qps / BASELINE_QPS, 2),
        "extra": {
            "coalesce": coalesce,
            "concurrency": CONCURRENCY,
            "n_requests": N_REQUESTS,
            "single_stream_p50_ms": round(single_p50, 1),
            "concurrent_p50_ms": round(p50, 1),
            "concurrent_p95_ms": round(p95, 1),
            "coalescer_batches": batches,
            "coalescer_requests": served,
            "note": "full HTTP stack (auth, rate limit, JSON) + hybrid "
                    "search + rerank on 10k chunks; real models, random "
                    "init; one v5e via relay",
        },
    }))


if __name__ == "__main__":
    sys.exit(main() or 0)
