"""WebSocket live transcription.

Parity surface: reference ``api/v1/streaming.py:26-230``:
``WS /api/v1/ws/transcribe`` — JSON command frames ({"command": "stop" |
"reset"}) + binary int16 PCM frames; transcript/status/error message
schemas; plus ``GET /api/v1/streaming/status``.

TPU-first deltas over the reference:

* the reference serves ONE session at a time behind a process lock and
  transcribes on the event loop (flagged in SURVEY.md §3.4). Here each
  connection gets its own session whose device work runs off-loop, and
  concurrent sessions' chunks multiplex into ONE window-batch dispatch
  (:mod:`audio_rag_tpu.asr.mux`) — the decode loop's weight reads are
  shared across sessions instead of queuing behind each other;
* sessions beyond ``streaming.max_sessions`` are refused with close
  code 4429 instead of silently queuing.
"""

from __future__ import annotations

import asyncio
import json

from audio_rag_tpu.api.config import APIConfig
from audio_rag_tpu.api.deps import authenticate
from audio_rag_tpu.api.http import App, Request, Response, WebSocket
from audio_rag_tpu.utils.logging import get_logger

log = get_logger(__name__)

__all__ = ["register_streaming_routes"]

_mux_lock = asyncio.Lock()


async def _get_streaming_mux(app: App):
    """Process-wide shared ASR backend + chunk mux (created once)."""
    async with _mux_lock:
        mux = app.state.get("streaming_mux")
        if mux is None:
            from audio_rag_tpu.asr.mux import StreamingMux
            from audio_rag_tpu.config.schema import ASRConfig

            rag_cfg = app.state.get("rag_config")
            asr_cfg = rag_cfg.asr if rag_cfg is not None else ASRConfig()
            if asr_cfg.backend == "fake":
                from audio_rag_tpu.asr.fake import FakeASR

                backend = FakeASR(asr_cfg)
            else:
                from audio_rag_tpu.asr.whisper_jax import WhisperJaxASR

                if asr_cfg.max_decode_tokens is None:
                    stream_cfg = (rag_cfg.streaming if rag_cfg is not None
                                  else None)
                    asr_cfg = asr_cfg.model_copy(update={
                        "max_decode_tokens": (
                            stream_cfg.max_decode_tokens
                            if stream_cfg is not None else 64),
                    })
                backend = WhisperJaxASR(asr_cfg)
            mux = StreamingMux(backend)
            app.state["streaming_mux"] = mux
            app.state["streaming_sessions"] = set()

            @app.on_shutdown
            async def stop_mux():
                # mux.stop() joins the worker thread (in-flight dispatch
                # can hold it ~1 s, minutes if compiling) — keep it off
                # the event loop so other connections drain meanwhile
                await asyncio.get_running_loop().run_in_executor(
                    None, mux.stop)
        return mux


def _new_session(app: App, mux):
    from audio_rag_tpu.asr.streaming import StreamingASR
    from audio_rag_tpu.config.schema import ASRConfig

    rag_cfg = app.state.get("rag_config")
    asr_cfg = rag_cfg.asr if rag_cfg is not None else ASRConfig()
    stream_cfg = (
        rag_cfg.streaming.to_runtime() if rag_cfg is not None else None
    )
    return StreamingASR(asr_cfg, stream_cfg, mux=mux)


def register_streaming_routes(app: App) -> None:
    config: APIConfig = app.state["config"]

    def _max_sessions() -> int:
        rag_cfg = app.state.get("rag_config")
        if rag_cfg is not None:
            return rag_cfg.streaming.max_sessions
        return 8

    @app.websocket("/api/v1/ws/transcribe")
    async def transcribe(request: Request, ws: WebSocket) -> None:
        # auth via header or ?api_key= query param (browsers can't set WS headers)
        api_key = request.header("x-api-key") or request.query.get("api_key")
        if not api_key or api_key not in config.api_keys:
            await ws.send_json({"type": "error", "error": "unauthorized"})
            await ws.close(4401)
            return

        mux = await _get_streaming_mux(app)
        sessions: set = app.state["streaming_sessions"]
        if len(sessions) >= _max_sessions():
            await ws.send_json({
                "type": "error",
                "error": f"session limit {_max_sessions()} reached",
            })
            await ws.close(4429)
            return

        loop = asyncio.get_running_loop()
        asr = _new_session(app, mux)
        # reserve the slot BEFORE the first await: the limit check and
        # add() must be one event-loop step, or a burst of connections
        # during the (long) first load all pass the check
        sessions.add(asr)
        try:
            # first session pays backend load + program warm; later
            # sessions find both done. Off-loop: load blocks for
            # seconds-to-minutes.
            await loop.run_in_executor(None, asr.load)
            await asr.start()
            await ws.send_json({"type": "status", "status": "listening"})
            while True:
                frame = await ws.recv()
                if frame is None:
                    break
                kind, data = frame
                if kind == "text":
                    try:
                        cmd = json.loads(data).get("command")
                    except json.JSONDecodeError:
                        await ws.send_json(
                            {"type": "error", "error": "invalid JSON"}
                        )
                        continue
                    if cmd == "stop":
                        final = await asr.stop()
                        if final is not None:
                            await ws.send_json(
                                {"type": "transcript", **final.to_dict()}
                            )
                        await ws.send_json(
                            {"type": "status", "status": "stopped"}
                        )
                        break
                    if cmd == "reset":
                        await asr.reset()
                        await ws.send_json(
                            {"type": "status", "status": "reset"}
                        )
                        continue
                    await ws.send_json(
                        {"type": "error",
                         "error": f"unknown command {cmd!r}"}
                    )
                else:  # binary PCM int16 @16 kHz
                    result = await asr.add_audio(data)
                    if result is not None:
                        await ws.send_json(
                            {"type": "transcript", **result.to_dict()}
                        )
        except ConnectionError:
            pass
        finally:
            sessions.discard(asr)
            if asr.state.value != "stopped":
                await asr.stop()

    @app.get("/api/v1/streaming/status")
    async def streaming_status(request: Request) -> Response:
        authenticate(request, config)
        mux = app.state.get("streaming_mux")
        sessions = app.state.get("streaming_sessions") or set()
        if mux is None:
            return Response.json({
                "active": False, "state": "idle", "sessions": 0,
                "max_sessions": _max_sessions(),
            })
        return Response.json({
            "active": bool(sessions),
            # aggregate state kept for reference-schema compatibility
            "state": "listening" if sessions else "idle",
            "sessions": len(sessions),
            "max_sessions": _max_sessions(),
            "chunks_served": mux.chunks_served,
            "batches_run": mux.batches_run,
            "buffered_s": [
                round(s.buffer.buffered_duration, 2) for s in sessions
            ],
        })
