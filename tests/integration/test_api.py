"""API integration tests: real server on a loopback port, real HTTP + WS
clients, fake model backends (reference tests use FastAPI TestClient with
dependency overrides; here we drive actual sockets)."""

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
from audio_rag_tpu.jobqueue.config import QueueConfig, StorageConfig
from audio_rag_tpu.jobqueue.queue import AudioRAGQueue
from audio_rag_tpu.jobqueue.store import JobStore
from audio_rag_tpu.pipeline.orchestrator import AudioRAG

PORT = 8765
BASE = f"http://127.0.0.1:{PORT}"
KEY = {"X-API-Key": "dev-key-basic"}


def make_rag():
    return AudioRAG(AudioRAGConfig(**{
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
    tmp = tmp_path_factory.mktemp("api")
    rag = make_rag()
    qcfg = QueueConfig(storage=StorageConfig(db_path=":memory:"))
    qcfg.worker.preload_models = False
    queue = AudioRAGQueue(qcfg, store=JobStore(":memory:"))
    api_cfg = APIConfig(upload_dir=str(tmp / "uploads"),
                        queue_db_path=":memory:")
    app = create_app(api_cfg, rag=rag, queue=queue)

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
    # wait for readiness
    for _ in range(50):
        try:
            httpx.get(f"{BASE}/health/live", timeout=1.0)
            break
        except Exception:
            time.sleep(0.1)
    yield {"rag": rag, "queue": queue, "app": app}
    stop.set()
    t.join(timeout=2.0)


@pytest.fixture(scope="module")
def seeded(server):
    """Ingest a tiny corpus directly through the pipeline."""
    import numpy as np

    from audio_rag_tpu.audio.io import write_wav
    import tempfile, os

    d = tempfile.mkdtemp()
    p = os.path.join(d, "x.wav")
    write_wav(p, 0.1 * np.random.default_rng(0).standard_normal(16000 * 10)
              .astype(np.float32), 16000)
    server["rag"].ingest(p)
    return server


class TestAuth:
    def test_missing_key_401(self, server):
        r = httpx.post(f"{BASE}/api/v1/query", json={"query": "x"})
        assert r.status_code == 401

    def test_bad_key_403(self, server):
        r = httpx.post(f"{BASE}/api/v1/query", json={"query": "x"},
                       headers={"X-API-Key": "nope"})
        assert r.status_code == 403

    def test_request_id_header(self, server):
        r = httpx.get(f"{BASE}/health/live")
        assert "x-request-id" in r.headers
        assert "x-response-time-ms" in r.headers


class TestHealth:
    def test_live(self, server):
        assert httpx.get(f"{BASE}/health/live").json()["status"] == "alive"

    def test_ready(self, server):
        r = httpx.get(f"{BASE}/health/ready")
        assert r.status_code == 200
        assert r.json()["checks"]["queue"] is True

    def test_startup(self, server):
        assert httpx.get(f"{BASE}/health/startup").status_code == 200


class TestQuery:
    def test_query_returns_results(self, seeded):
        r = httpx.post(
            f"{BASE}/api/v1/query",
            json={"query": "word0 word1", "search_type": "dense",
                  "rerank": False},
            headers=KEY, timeout=30.0,
        )
        assert r.status_code == 200
        body = r.json()
        assert body["results"]
        assert body["response"]
        assert "x-ratelimit-limit" in r.headers

    def test_query_with_answer(self, seeded):
        r = httpx.post(
            f"{BASE}/api/v1/query",
            json={"query": "word0", "generate_answer": True},
            headers=KEY, timeout=30.0,
        )
        assert "fake answer" in r.json()["answer"]

    def test_query_spoken_answer_round_trips_wav(self, seeded):
        """speak_answer returns the synthesized WAV as base64 (the
        reference only wrote TTS output server-side)."""
        import base64
        import io
        import wave

        r = httpx.post(
            f"{BASE}/api/v1/query",
            json={"query": "word0", "generate_answer": True,
                  "speak_answer": True},
            headers=KEY, timeout=60.0,
        )
        assert r.status_code == 200
        b64 = r.json()["answer_audio_b64"]
        assert b64
        with wave.open(io.BytesIO(base64.b64decode(b64))) as wf:
            assert wf.getnframes() > 0

    def test_validation_422(self, server):
        r = httpx.post(f"{BASE}/api/v1/query", json={"query": ""},
                       headers=KEY)
        assert r.status_code == 422

    def test_unknown_route_404(self, server):
        assert httpx.get(f"{BASE}/api/v1/nope",
                         headers=KEY).status_code == 404

    def test_wrong_method_405(self, server):
        assert httpx.get(f"{BASE}/api/v1/query",
                         headers=KEY).status_code == 405


class TestIngest:
    def make_wav_bytes(self) -> bytes:
        import io
        import wave

        buf = io.BytesIO()
        with wave.open(buf, "wb") as wf:
            wf.setnchannels(1)
            wf.setsampwidth(2)
            wf.setframerate(16000)
            wf.writeframes(
                (np.random.default_rng(0).standard_normal(16000 * 2) * 3000)
                .astype("<i2").tobytes()
            )
        return buf.getvalue()

    def test_upload_and_job_status(self, server):
        wav = self.make_wav_bytes()
        r = httpx.post(
            f"{BASE}/api/v1/ingest",
            files={"file": ("lecture.wav", wav, "audio/wav")},
            data={"priority": "high",
                  "metadata": json.dumps({"course": "cs229"})},
            headers=KEY, timeout=30.0,
        )
        assert r.status_code == 202
        body = r.json()
        assert body["queue"] == "high"
        job_id = body["job_id"]

        st = httpx.get(f"{BASE}/api/v1/jobs/{job_id}", headers=KEY)
        assert st.status_code == 200
        assert st.json()["status"] == "queued"

        # drain with an in-process worker against the same store
        from audio_rag_tpu.jobqueue.worker import TPUWorker

        worker = TPUWorker(server["queue"].config,
                           store=server["queue"].store,
                           rag_factory=lambda: server["rag"])
        assert worker.run_once()
        st2 = httpx.get(f"{BASE}/api/v1/jobs/{job_id}", headers=KEY).json()
        assert st2["status"] == "completed"
        assert st2["result"]["num_chunks"] > 0

    def test_bad_extension_422(self, server):
        r = httpx.post(
            f"{BASE}/api/v1/ingest",
            files={"file": ("x.txt", b"hello", "text/plain")},
            headers=KEY,
        )
        assert r.status_code == 422

    def test_jobs_list_pagination(self, server):
        r = httpx.get(f"{BASE}/api/v1/jobs?limit=5", headers=KEY)
        assert r.status_code == 200
        body = r.json()
        assert {"jobs", "total", "limit", "offset"} <= set(body)
        assert body["limit"] == 5
        assert all(j["tenant_id"] == "dev_tenant_basic"
                   for j in body["jobs"])
        # probe: non-integer paging params
        assert httpx.get(f"{BASE}/api/v1/jobs?limit=abc",
                         headers=KEY).status_code == 422

    def test_job_not_found_404(self, server):
        r = httpx.get(f"{BASE}/api/v1/jobs/doesnotexist", headers=KEY)
        assert r.status_code == 404

    def test_duplicate_409(self, server):
        wav = self.make_wav_bytes() + b"unique-suffix-dup-test"
        for expected in (202, 409):
            r = httpx.post(
                f"{BASE}/api/v1/ingest",
                files={"file": ("dup.wav", wav, "audio/wav")},
                headers=KEY, timeout=30.0,
            )
            assert r.status_code == expected


class TestCollections:
    def test_list_and_info(self, seeded):
        r = httpx.get(f"{BASE}/api/v1/collections", headers=KEY)
        names = [c["name"] for c in r.json()["collections"]]
        assert "audio_rag" in names
        info = httpx.get(f"{BASE}/api/v1/collections/audio_rag",
                         headers=KEY).json()
        assert info["count"] > 0

    def test_missing_collection_404(self, server):
        assert httpx.get(f"{BASE}/api/v1/collections/zzz",
                         headers=KEY).status_code == 404


class TestWebSocketStreaming:
    def test_ws_transcribe_roundtrip(self, server):
        import websockets.sync.client as wsc

        pcm = (np.random.default_rng(0).standard_normal(16000) * 3000) \
            .astype("<i2").tobytes()
        url = f"ws://127.0.0.1:{PORT}/api/v1/ws/transcribe?api_key=dev-key-basic"
        with wsc.connect(url) as ws:
            hello = json.loads(ws.recv(timeout=10))
            assert hello == {"type": "status", "status": "listening"}
            # 6s of audio in 1s frames → at least one 5s-chunk transcript
            transcripts = []
            for _ in range(6):
                ws.send(pcm)
                try:
                    while True:
                        msg = json.loads(ws.recv(timeout=5))
                        if msg["type"] == "transcript":
                            transcripts.append(msg)
                        break
                except TimeoutError:
                    pass
            ws.send(json.dumps({"command": "stop"}))
            # drain until stopped status
            for _ in range(10):
                msg = json.loads(ws.recv(timeout=10))
                if msg.get("status") == "stopped":
                    break
                if msg["type"] == "transcript":
                    transcripts.append(msg)
        assert transcripts, "expected at least one transcript message"
        assert transcripts[0]["text"]
        assert transcripts[0]["end"] > transcripts[0]["start"]

    def test_ws_unauthorized(self, server):
        import websockets.sync.client as wsc

        url = f"ws://127.0.0.1:{PORT}/api/v1/ws/transcribe"
        with wsc.connect(url) as ws:
            msg = json.loads(ws.recv(timeout=5))
            assert msg["error"] == "unauthorized"

    def test_streaming_status_endpoint(self, server):
        r = httpx.get(f"{BASE}/api/v1/streaming/status", headers=KEY)
        assert r.status_code == 200
        body = r.json()
        assert "state" in body
        assert "max_sessions" in body

    def test_ws_session_limit_refused_4429(self, server):
        """Connections beyond streaming.max_sessions get an explicit
        error + close code 4429 (the reference silently queues them
        behind its process lock)."""
        import websockets.sync.client as wsc
        from websockets.exceptions import ConnectionClosed

        rag_cfg = server["rag"].config
        old = rag_cfg.streaming.max_sessions
        rag_cfg.streaming.max_sessions = 1
        url = (f"ws://127.0.0.1:{PORT}/api/v1/ws/transcribe"
               f"?api_key=dev-key-basic")
        try:
            with wsc.connect(url) as ws1:
                assert json.loads(ws1.recv(timeout=10))["status"] == \
                    "listening"
                with wsc.connect(url) as ws2:
                    msg = json.loads(ws2.recv(timeout=10))
                    assert msg["type"] == "error"
                    assert "session limit" in msg["error"]
                    with pytest.raises(ConnectionClosed) as ei:
                        while True:
                            ws2.recv(timeout=10)
                    assert ei.value.rcvd.code == 4429
                ws1.send(json.dumps({"command": "stop"}))
        finally:
            rag_cfg.streaming.max_sessions = old

    def test_concurrent_ws_sessions(self, server):
        """Two live sessions stream simultaneously (the reference allows
        one at a time); both get transcripts, chunks mux into batches."""
        import websockets.sync.client as wsc

        pcm = (np.random.default_rng(1).standard_normal(16000) * 3000) \
            .astype("<i2").tobytes()
        url = f"ws://127.0.0.1:{PORT}/api/v1/ws/transcribe?api_key=dev-key-basic"
        results = [[], []]

        def session(i):
            with wsc.connect(url) as ws:
                hello = json.loads(ws.recv(timeout=10))
                assert hello["status"] == "listening"
                for _ in range(6):
                    ws.send(pcm)
                    try:
                        msg = json.loads(ws.recv(timeout=2))
                        if msg["type"] == "transcript":
                            results[i].append(msg)
                    except TimeoutError:
                        pass
                ws.send(json.dumps({"command": "stop"}))
                for _ in range(10):
                    msg = json.loads(ws.recv(timeout=10))
                    if msg.get("status") == "stopped":
                        break
                    if msg["type"] == "transcript":
                        results[i].append(msg)

        threads = [threading.Thread(target=session, args=(i,))
                   for i in range(2)]
        [t.start() for t in threads]
        [t.join(timeout=60) for t in threads]
        assert results[0] and results[1], \
            "both concurrent sessions must produce transcripts"
        status = httpx.get(f"{BASE}/api/v1/streaming/status",
                           headers=KEY).json()
        assert status["chunks_served"] >= 2


class TestMetrics:
    def test_prometheus_exposition(self, server, seeded):
        # drive one authenticated request so the request counter has data
        httpx.post(f"{BASE}/api/v1/query", headers=KEY,
                   json={"query": "word0", "rerank": False})
        r = httpx.get(f"{BASE}/metrics")
        assert r.status_code == 200
        assert r.headers["content-type"].startswith("text/plain")
        body = r.text
        # counters labeled by ROUTE TEMPLATE (bounded cardinality)
        assert 'audio_rag_requests_total{' in body
        assert 'route="/api/v1/query"' in body
        assert "audio_rag_request_seconds_sum" in body
        # live gauges from the queue / resource manager / engine
        assert "audio_rag_queue_depth" in body
        assert "audio_rag_hbm_budget_gb" in body
        assert "audio_rag_compiled_programs" in body
        assert "audio_rag_uptime_seconds" in body
        # every line parses as `name{labels} value` or `# comment`
        for line in body.strip().splitlines():
            if line.startswith("#"):
                continue
            assert " " in line, line
            float(line.rsplit(" ", 1)[1])

    def test_metrics_auth_gate(self, server):
        """metrics_require_auth closes the scrape endpoint to
        unauthenticated clients (queue depths / resident models leak
        when the port is exposed beyond the cluster)."""
        cfg = server["app"].state["config"]
        cfg.metrics_require_auth = True
        try:
            r = httpx.get(f"{BASE}/metrics")
            assert r.status_code == 401
            r = httpx.get(f"{BASE}/metrics", headers=KEY)
            assert r.status_code == 200
        finally:
            cfg.metrics_require_auth = False

    def test_metrics_route_counts_increment(self, server):
        r1 = httpx.get(f"{BASE}/metrics")
        httpx.get(f"{BASE}/health/live")
        r2 = httpx.get(f"{BASE}/metrics")

        def count(body):
            for line in body.splitlines():
                if line.startswith("audio_rag_requests_total") and \
                        'route="/health/live"' in line:
                    return float(line.rsplit(" ", 1)[1])
            return 0.0

        assert count(r2.text) == count(r1.text) + 1


class TestQueryCoalescing:
    def test_concurrent_queries_coalesce_and_match(self, server, seeded):
        """Concurrent search-only POST /query requests ride fused batches
        (engine/query_coalescer.py) and return the same results as a
        sequential request."""
        import concurrent.futures as cf

        def ask(q):
            r = httpx.post(f"{BASE}/api/v1/query", headers=KEY,
                           json={"query": q, "rerank": False, "top_k": 3},
                           timeout=30.0)
            assert r.status_code == 200
            return r.json()

        sequential = {q: ask(q)["results"] for q in
                      [f"word{i}" for i in range(6)]}
        with cf.ThreadPoolExecutor(max_workers=6) as pool:
            concurrent = dict(zip(
                sequential,
                pool.map(lambda q: ask(q)["results"], sequential),
            ))
        for q in sequential:
            assert [r["chunk_id"] for r in concurrent[q]] == [
                r["chunk_id"] for r in sequential[q]]
        c = server["app"].state.get("query_coalescer")
        assert c is not None and c.requests_served >= 12

    def test_hyde_request_keeps_single_path(self, server, seeded):
        r = httpx.post(f"{BASE}/api/v1/query", headers=KEY,
                       json={"query": "word0", "use_hyde": True,
                             "rerank": False}, timeout=30.0)
        assert r.status_code == 200
