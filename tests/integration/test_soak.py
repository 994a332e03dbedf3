"""Mixed-load soak: queries + WS streaming + metrics, concurrently.

The round-3 review bugs (coalescer stop/submit race, event-loop device
work under ``include_context``) were all integration-level concurrency:
each path worked alone and broke only when the API multiplexed them.
This module drives every serving surface at once against the fake-backend
stack and asserts nothing hangs, errors, or starves — bounded to a few
seconds of wall clock so it stays in the default suite.
"""

from __future__ import annotations

import asyncio
import json
import threading
import time

import httpx
import numpy as np
import pytest

from audio_rag_tpu.api.app import create_app
from audio_rag_tpu.api.config import APIConfig
from audio_rag_tpu.config.schema import AudioRAGConfig
from audio_rag_tpu.pipeline.orchestrator import AudioRAG

PORT = 8771
BASE = f"http://127.0.0.1:{PORT}"
KEY = {"X-API-Key": "dev-key-premium"}


def make_rag():
    return AudioRAG(AudioRAGConfig.model_validate({
        "asr": {"backend": "fake"},
        "diarization": {"backend": "fake"},
        "embedding": {"backend": "fake"},
        "retrieval": {"backend": "tpu", "capacity_step": 128},
        "reranking": {"backend": "fake"},
        "generation": {"backend": "fake"},
        "tts": {"backend": "null"},
    }))


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("soak")
    rag = make_rag()
    api_cfg = APIConfig(upload_dir=str(tmp / "uploads"),
                        queue_db_path=":memory:")
    # the soak hammers far past the production tiers; rate limiting has
    # its own tests — uncap so this module measures concurrency, not 429s
    from audio_rag_tpu.api.config import RateLimitTier

    api_cfg.tiers["premium"] = RateLimitTier(
        query_per_minute=10**6, ingest_per_hour=10**6,
        status_per_minute=10**6)
    app = create_app(api_cfg, rag=rag)

    loop = asyncio.new_event_loop()
    stop = threading.Event()

    async def _serve():
        srv = await asyncio.start_server(app._handle_conn, "127.0.0.1", PORT)
        async with srv:
            while not stop.is_set():
                await asyncio.sleep(0.1)

    t = threading.Thread(
        target=lambda: loop.run_until_complete(_serve()), daemon=True
    )
    t.start()
    for _ in range(50):
        try:
            httpx.get(f"{BASE}/health/live", timeout=1.0)
            break
        except Exception:
            time.sleep(0.1)

    # seed a tiny corpus through the pipeline
    from audio_rag_tpu.audio.io import write_wav
    from audio_rag_tpu.audio.synth import speech_like

    wav_path = str(tmp / "seed.wav")
    write_wav(wav_path, speech_like(16000 * 6, 16000, seed=7), 16000)
    rag.ingest(wav_path)

    yield {"rag": rag, "app": app}
    stop.set()
    t.join(timeout=2.0)


class TestMixedLoadSoak:
    def test_all_surfaces_concurrently(self, server):
        """3 query threads (coalesced search / include_context / answer),
        2 WS streaming sessions, and a metrics scraper, all at once. No
        request may fail and none may hang past its timeout."""
        import websockets.sync.client as wsc

        errors: list[str] = []
        q_done = [0]
        transcripts = [0]
        deadline = time.monotonic() + 8.0

        def query_worker(seed: int):
            i = 0
            while time.monotonic() < deadline:
                body = {"query": f"word{(seed + i) % 5}",
                        "rerank": i % 2 == 0,
                        "include_context": i % 3 == 0,
                        "generate_answer": i % 5 == 0}
                try:
                    r = httpx.post(f"{BASE}/api/v1/query", headers=KEY,
                                   json=body, timeout=30)
                    if r.status_code != 200:
                        errors.append(f"query {r.status_code}: {r.text}")
                        return
                    out = r.json()
                    if body["include_context"] and out["results"] and \
                            not out["context"]:
                        errors.append("include_context returned no block")
                    q_done[0] += 1
                except Exception as exc:
                    errors.append(f"query raised: {exc!r}")
                    return
                i += 1

        def ws_worker(seed: int):
            pcm = (np.random.default_rng(seed).standard_normal(16000)
                   * 3000).astype("<i2").tobytes()
            url = (f"ws://127.0.0.1:{PORT}/api/v1/ws/transcribe"
                   f"?api_key=dev-key-premium")
            try:
                with wsc.connect(url) as ws:
                    hello = json.loads(ws.recv(timeout=10))
                    if hello.get("status") != "listening":
                        errors.append(f"ws hello: {hello}")
                        return
                    while time.monotonic() < deadline:
                        ws.send(pcm)
                        try:
                            msg = json.loads(ws.recv(timeout=2))
                            if msg["type"] == "transcript":
                                transcripts[0] += 1
                        except TimeoutError:
                            pass
                    ws.send(json.dumps({"command": "stop"}))
                    for _ in range(10):
                        msg = json.loads(ws.recv(timeout=10))
                        if msg.get("status") == "stopped":
                            break
                        if msg["type"] == "transcript":
                            transcripts[0] += 1
            except Exception as exc:
                errors.append(f"ws raised: {exc!r}")

        def scrape_worker():
            while time.monotonic() < deadline:
                try:
                    r = httpx.get(f"{BASE}/metrics", timeout=10)
                    if r.status_code != 200:
                        errors.append(f"metrics {r.status_code}")
                        return
                    r = httpx.get(f"{BASE}/api/v1/status", headers=KEY,
                                  timeout=10)
                    if r.status_code != 200:
                        errors.append(f"status {r.status_code}")
                        return
                except Exception as exc:
                    errors.append(f"scrape raised: {exc!r}")
                    return
                time.sleep(0.2)

        threads = (
            [threading.Thread(target=query_worker, args=(s,))
             for s in range(3)]
            + [threading.Thread(target=ws_worker, args=(s,))
               for s in (10, 11)]
            + [threading.Thread(target=scrape_worker)]
        )
        [t.start() for t in threads]
        [t.join(timeout=60) for t in threads]
        assert not any(t.is_alive() for t in threads), "a worker hung"
        assert not errors, errors[:5]
        assert q_done[0] >= 9, f"query starvation: {q_done[0]}"
        assert transcripts[0] >= 2, "streaming starved under load"
        # server still healthy after the storm
        assert httpx.get(f"{BASE}/health/ready",
                         timeout=10).status_code == 200

    def test_coalescer_shutdown_under_load_no_hang(self, server):
        """Stopping the coalescer mid-traffic must fail in-flight
        requests CLEANLY (5xx) — never hang the HTTP workers — and a
        fresh coalescer must serve again afterwards."""
        app = server["app"]
        statuses: list[int] = []
        done = threading.Event()

        def fire():
            while not done.is_set():
                try:
                    r = httpx.post(f"{BASE}/api/v1/query", headers=KEY,
                                   json={"query": "word1",
                                         "rerank": False}, timeout=30)
                    statuses.append(r.status_code)
                except Exception:
                    statuses.append(-1)

        threads = [threading.Thread(target=fire) for _ in range(3)]
        [t.start() for t in threads]
        time.sleep(0.3)
        c = app.state.get("query_coalescer")
        if c is not None:
            c.stop()
        time.sleep(0.3)
        done.set()
        [t.join(timeout=30) for t in threads]
        assert not any(t.is_alive() for t in threads), \
            "request thread hung through coalescer shutdown"
        assert statuses, "no requests completed"
        # lazy rebuild: a fresh coalescer serves the next request
        app.state.pop("query_coalescer", None)
        r = httpx.post(f"{BASE}/api/v1/query", headers=KEY,
                       json={"query": "word2", "rerank": False},
                       timeout=30)
        assert r.status_code == 200
