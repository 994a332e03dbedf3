"""Frontend (SPA) integration: every flow the web UI drives, tested
against the real server.

The reference ships a ~1.1k-LoC React app with zero tests; here the
dependency-free SPA's contract with the API is pinned: static serving,
a route-contract test (every fetch/WS URL in app.js resolves to a
registered route), the stage-enum mirror the progress stepper renders,
and one test per UI flow — search, upload + job progress + result
fields, job cancel, collection delete, and the streaming WebSocket
message shapes (type/text/start/is_final) the partial-rendering code
reads.
"""

import asyncio
import json
import re
import threading
import time
from pathlib import Path

import httpx
import numpy as np
import pytest

from audio_rag_tpu.api.app import create_app
from audio_rag_tpu.api.config import APIConfig
from audio_rag_tpu.config.schema import AudioRAGConfig
from audio_rag_tpu.jobqueue.config import QueueConfig, StorageConfig
from audio_rag_tpu.jobqueue.job import STAGE_ORDER
from audio_rag_tpu.jobqueue.queue import AudioRAGQueue
from audio_rag_tpu.jobqueue.store import JobStore
from audio_rag_tpu.pipeline.orchestrator import AudioRAG

PORT = 8792
BASE = f"http://127.0.0.1:{PORT}"
KEY = {"X-API-Key": "dev-key-basic"}
FRONTEND = Path(__file__).resolve().parents[2] / "frontend"


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
    tmp = tmp_path_factory.mktemp("fe")
    rag = make_rag()
    qcfg = QueueConfig(storage=StorageConfig(db_path=":memory:"))
    qcfg.worker.preload_models = False
    queue = AudioRAGQueue(qcfg, store=JobStore(":memory:"))
    app = create_app(
        APIConfig(upload_dir=str(tmp / "uploads"), queue_db_path=":memory:"),
        rag=rag, queue=queue)

    loop = asyncio.new_event_loop()
    stop = threading.Event()

    async def _serve():
        srv = await asyncio.start_server(app._handle_conn, "127.0.0.1", PORT)
        async with srv:
            while not stop.is_set():
                await asyncio.sleep(0.1)

    t = threading.Thread(target=lambda: loop.run_until_complete(_serve()),
                         daemon=True)
    t.start()
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
def wav_path(tmp_path_factory):
    from audio_rag_tpu.audio.io import write_wav

    p = tmp_path_factory.mktemp("au") / "clip.wav"
    write_wav(str(p), 0.1 * np.random.default_rng(0)
              .standard_normal(16000 * 5).astype(np.float32), 16000)
    return p


class TestStaticServing:
    def test_index_served_with_ui_elements(self, server):
        html = httpx.get(f"{BASE}/").text
        # every element id the JS drives must exist in the page
        app_js = (FRONTEND / "app.js").read_text()
        for el_id in set(re.findall(r'\$\("([A-Za-z]+)"\)', app_js)):
            assert f'id="{el_id}"' in html, f"missing #{el_id} in index.html"

    def test_assets_served(self, server):
        assert httpx.get(f"{BASE}/app.js").status_code == 200
        assert httpx.get(f"{BASE}/styles.css").status_code == 200


class TestRouteContract:
    def test_every_spa_url_has_a_route(self, server):
        """Every fetch/WebSocket URL in app.js must resolve against the
        server's route table (template vars become a placeholder)."""
        app_js = (FRONTEND / "app.js").read_text()
        urls = set(re.findall(r'["`](/(?:api|health)[^"`\s?]*)', app_js))
        assert urls, "no SPA URLs found - parser broke?"
        app = server["app"]
        http_pats = [p for _, p, _, _ in app._routes]
        ws_pats = [p for p, _ in app._ws_routes]
        for url in urls:
            path = re.sub(r"\$\{[^}]*\}", "xyz", url)
            pats = ws_pats if "/ws/" in path else http_pats
            assert any(p.match(path) for p in pats), \
                f"SPA references unrouted path {url}"

    def test_stage_stepper_mirrors_job_stage_enum(self):
        """The JS STAGES constant must equal jobqueue STAGE_ORDER —
        the progress stepper renders the real pipeline stages."""
        app_js = (FRONTEND / "app.js").read_text()
        m = re.search(r"const STAGES = \[(.*?)\];", app_js, re.S)
        assert m, "STAGES constant missing from app.js"
        js_stages = re.findall(r'"([a-z]+)"', m.group(1))
        assert js_stages == [s.value for s in STAGE_ORDER]


class TestSearchFlow:
    def test_query_shape_matches_spa(self, server, wav_path):
        server["rag"].ingest(str(wav_path), collection="fe_search")
        body = {  # exactly what runSearch() sends
            "query": "what was said",
            "search_type": "hybrid",
            "generate_answer": True,
            "use_hyde": False,
            "top_k": 5,
            "collection": "fe_search",
        }
        r = httpx.post(f"{BASE}/api/v1/query", json=body, headers=KEY,
                       timeout=60)
        assert r.status_code == 200
        data = r.json()
        # the fields the result cards / answer card read
        assert "answer" in data and "elapsed_s" in data
        assert data["results"]
        for x in data["results"]:
            assert {"score", "start", "end", "text"} <= set(x)

    def test_error_state_payload(self, server):
        r = httpx.post(f"{BASE}/api/v1/query", json={"query": "x"},
                       headers={"X-API-Key": "nope"})
        assert r.status_code == 403
        assert "detail" in r.json()  # apiError() reads .detail


class TestUploadFlow:
    def _upload(self, server, wav_path, collection="fe_up"):
        with open(wav_path, "rb") as f:
            r = httpx.post(
                f"{BASE}/api/v1/ingest",
                files={"file": ("clip.wav", f, "audio/wav")},
                data={"priority": "normal", "collection": collection},
                headers=KEY, timeout=60)
        assert r.status_code == 202, r.text
        return r.json()["job_id"]

    def test_job_progress_and_result_fields(self, server, wav_path):
        job_id = self._upload(server, wav_path)
        st = httpx.get(f"{BASE}/api/v1/jobs/{job_id}", headers=KEY).json()
        # fields trackJob() renders
        assert {"status", "stage", "progress"} <= set(st)
        from audio_rag_tpu.jobqueue.worker import TPUWorker

        worker = TPUWorker(server["queue"].config,
                           store=server["queue"].store,
                           rag_factory=lambda: server["rag"])
        assert worker.run_once()
        st2 = httpx.get(f"{BASE}/api/v1/jobs/{job_id}", headers=KEY).json()
        assert st2["status"] == "completed"
        assert st2["progress"] == pytest.approx(1.0)
        # the result summary line's fields
        assert {"num_chunks", "num_speakers", "duration_s"} \
            <= set(st2["result"])

    def test_cancel_flow(self, server, tmp_path):
        # distinct audio content: the idempotency key hashes the file,
        # so re-uploading wav_path would 409 against the first test's job
        from audio_rag_tpu.audio.io import write_wav

        p = tmp_path / "clip2.wav"
        write_wav(str(p), 0.1 * np.random.default_rng(7)
                  .standard_normal(16000 * 5).astype(np.float32), 16000)
        job_id = self._upload(server, p, collection="fe_cancel")
        r = httpx.request("DELETE", f"{BASE}/api/v1/jobs/{job_id}",
                          headers=KEY)
        assert r.status_code == 200
        assert r.json()["cancelled"] is True
        st = httpx.get(f"{BASE}/api/v1/jobs/{job_id}", headers=KEY).json()
        assert st["status"] == "cancelled"


class TestCollectionFlow:
    def test_list_and_delete(self, server, wav_path):
        server["rag"].ingest(str(wav_path), collection="fe_del")
        cols = httpx.get(f"{BASE}/api/v1/collections",
                         headers=KEY).json()["collections"]
        mine = [c for c in cols if c["name"] == "fe_del"]
        assert mine and mine[0]["count"] > 0  # c.name / c.count in the JS
        r = httpx.request(
            "DELETE", f"{BASE}/api/v1/collections/fe_del", headers=KEY)
        assert r.status_code == 200
        cols2 = httpx.get(f"{BASE}/api/v1/collections",
                          headers=KEY).json()["collections"]
        assert not [c for c in cols2 if c["name"] == "fe_del"]

    def test_delete_missing_404(self, server):
        r = httpx.request(
            "DELETE", f"{BASE}/api/v1/collections/never_existed",
            headers=KEY)
        assert r.status_code == 404


class TestStreamingFlow:
    def test_ws_message_shapes_for_partial_rendering(self, server):
        """The WS messages must carry the fields the SPA's onmessage
        reads: type, and for transcripts text/start/is_final."""
        import websockets.sync.client as wsc

        url = (f"ws://127.0.0.1:{PORT}/api/v1/ws/transcribe"
               f"?api_key=dev-key-basic")
        pcm = (np.random.default_rng(0).standard_normal(16000)
               * 3000).astype(np.int16).tobytes()
        got_status, got_transcript = False, False
        with wsc.connect(url) as ws:
            hello = json.loads(ws.recv(timeout=10))
            assert hello["type"] == "status"
            got_status = True
            for _ in range(6):  # ≥ one 5 s chunk
                ws.send(pcm)
            ws.send(json.dumps({"command": "stop"}))
            for _ in range(20):
                try:
                    msg = json.loads(ws.recv(timeout=10))
                except Exception:
                    break
                if msg["type"] == "transcript":
                    assert {"text", "start", "is_final"} <= set(msg)
                    got_transcript = True
                if msg["type"] == "status" and msg["status"] == "stopped":
                    break
        assert got_status and got_transcript
