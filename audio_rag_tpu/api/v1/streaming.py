"""WebSocket live transcription.

Parity surface: reference ``api/v1/streaming.py:26-230``:
``WS /api/v1/ws/transcribe`` — JSON command frames ({"command": "stop" |
"reset"}) + binary int16 PCM frames; transcript/status/error message
schemas; a lock-guarded process-wide StreamingASR; plus
``GET /api/v1/streaming/status``.

The reference transcribes on the event loop (flagged in SURVEY.md §3.4);
here the StreamingASR backend already runs device work in its own worker
thread, so the socket stays responsive during transcription.
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

_asr_lock = asyncio.Lock()


def _get_streaming_asr(app: App):
    asr = app.state.get("streaming_asr")
    if asr is None:
        from audio_rag_tpu.asr.streaming import StreamingASR
        from audio_rag_tpu.config.schema import ASRConfig

        rag_cfg = app.state.get("rag_config")
        asr_cfg = rag_cfg.asr if rag_cfg is not None else ASRConfig()
        stream_cfg = (
            rag_cfg.streaming.to_runtime() if rag_cfg is not None else None
        )
        if asr_cfg.backend == "fake":
            from audio_rag_tpu.asr.fake import FakeASR

            asr = StreamingASR(asr_cfg, stream_cfg, backend=FakeASR(asr_cfg))
        else:
            asr = StreamingASR(asr_cfg, stream_cfg)
        asr.load()
        app.state["streaming_asr"] = asr
    return asr


def register_streaming_routes(app: App) -> None:
    config: APIConfig = app.state["config"]

    @app.websocket("/api/v1/ws/transcribe")
    async def transcribe(request: Request, ws: WebSocket) -> None:
        # auth via header or ?api_key= query param (browsers can't set WS headers)
        api_key = request.header("x-api-key") or request.query.get("api_key")
        if not api_key or api_key not in config.api_keys:
            await ws.send_json({"type": "error", "error": "unauthorized"})
            await ws.close(4401)
            return

        async with _asr_lock:  # one streaming session at a time (ref parity)
            asr = _get_streaming_asr(app)
            await asr.reset()
            await asr.start()
            await ws.send_json({"type": "status", "status": "listening"})
            try:
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
                                    {"type": "transcript",
                                     **final.to_dict()}
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
                if asr.state.value != "stopped":
                    await asr.stop()

    @app.get("/api/v1/streaming/status")
    async def streaming_status(request: Request) -> Response:
        authenticate(request, config)
        asr = app.state.get("streaming_asr")
        if asr is None:
            return Response.json({"active": False, "state": "idle"})
        return Response.json({
            "active": asr.state.value in ("listening", "processing"),
            "state": asr.state.value,
            "buffered_s": round(asr.buffer.buffered_duration, 2),
            "total_s": round(asr.buffer.total_duration, 2),
        })
