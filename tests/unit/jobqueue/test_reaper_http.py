"""Stale-job reaper + HTTP framework edge cases."""

import asyncio

import pytest

from audio_rag_tpu.jobqueue.job import IngestJob, JobStatus
from audio_rag_tpu.jobqueue.store import JobStore


class TestStaleReaper:
    def test_dead_worker_job_requeued(self, tmp_path):
        store = JobStore(":memory:")
        wav = tmp_path / "a.wav"
        wav.write_bytes(b"RIFF" + b"\x00" * 64)
        job = IngestJob("t", str(wav))
        store.insert_job(job, "normal")
        claimed = store.claim_next("dead-worker")
        assert claimed.job_id == job.job_id
        # no heartbeat registered for dead-worker → reaper requeues
        stale = store.requeue_stale(worker_ttl_s=60)
        assert stale == [job.job_id]
        assert store.get_job_row(job.job_id)["status"] == "queued"
        # a live worker can claim it again
        assert store.claim_next("live").job_id == job.job_id

    def test_live_worker_job_untouched(self, tmp_path):
        store = JobStore(":memory:")
        wav = tmp_path / "a.wav"
        wav.write_bytes(b"x")
        job = IngestJob("t", str(wav))
        store.insert_job(job, "normal")
        store.claim_next("w1")
        store.heartbeat("w1", {})
        assert store.requeue_stale(worker_ttl_s=60) == []
        assert store.get_job_row(job.job_id)["status"] == "running"


class TestHTTPFramework:
    def run(self, coro):
        return asyncio.run(coro)

    def make_app(self):
        from audio_rag_tpu.api.http import App, Request, Response

        app = App()

        @app.get("/items/{item_id}")
        async def item(request: Request) -> Response:
            return Response.json({"id": request.path_params["item_id"],
                                  "q": request.query})

        @app.post("/echo")
        async def echo(request: Request) -> Response:
            return Response.json({"body": request.json()})

        return app

    def dispatch(self, app, method, path, body=b"", headers=None):
        from audio_rag_tpu.api.http import Request

        req = Request(method=method, path=path, query={},
                      headers=headers or {}, body=body)
        import urllib.parse

        parsed = urllib.parse.urlsplit(path)
        req.path = parsed.path
        req.query = dict(urllib.parse.parse_qsl(parsed.query))
        return self.run(app.dispatch(req))

    def test_path_params_and_query(self):
        app = self.make_app()
        resp = self.dispatch(app, "GET", "/items/42?x=1")
        import json

        data = json.loads(resp.body)
        assert data["id"] == "42" and data["q"] == {"x": "1"}

    def test_404_and_405(self):
        app = self.make_app()
        assert self.dispatch(app, "GET", "/nope").status == 404
        resp = self.dispatch(app, "DELETE", "/items/1")
        assert resp.status == 405
        assert "GET" in resp.headers["allow"]

    def test_invalid_json_400(self):
        app = self.make_app()
        assert self.dispatch(app, "POST", "/echo", b"{oops").status == 400

    def test_trailing_slash_matches(self):
        app = self.make_app()
        assert self.dispatch(app, "GET", "/items/7/").status == 200

    def test_middleware_order_and_shortcircuit(self):
        from audio_rag_tpu.api.http import App, Request, Response

        app = App()
        calls = []

        @app.middleware
        async def outer(request, call_next):
            calls.append("outer-in")
            resp = await call_next(request)
            calls.append("outer-out")
            return resp

        @app.middleware
        async def blocker(request, call_next):
            calls.append("blocker")
            if request.headers.get("x-block"):
                return Response.json({"blocked": True}, 403)
            return await call_next(request)

        @app.get("/x")
        async def x(request: Request) -> Response:
            calls.append("handler")
            return Response.json({})

        self.dispatch(app, "GET", "/x")
        assert calls == ["outer-in", "blocker", "handler", "outer-out"]
        calls.clear()
        resp = self.dispatch(app, "GET", "/x", headers={"x-block": "1"})
        assert resp.status == 403 and "handler" not in calls

    def test_unhandled_error_500(self):
        from audio_rag_tpu.api.http import App, Request, Response

        app = App()

        @app.get("/boom")
        async def boom(request: Request) -> Response:
            raise RuntimeError("kaboom")

        resp = self.dispatch(app, "GET", "/boom")
        assert resp.status == 500
        assert b"kaboom" not in resp.body  # no internals leaked
