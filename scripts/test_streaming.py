#!/usr/bin/env python
"""Streaming test client.

Parity surface: reference ``scripts/test_streaming.py``: drive the streaming
path three ways — (a) a WAV file replayed through the local chunking state
machine, (b) the WebSocket endpoint with a file, (c) microphone capture when
``sounddevice`` exists (absent in this image; gated).
"""

from __future__ import annotations

import argparse
import asyncio
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def test_with_file(path: str, backend: str = "fake") -> None:
    from audio_rag_tpu.asr.streaming import StreamingASR
    from audio_rag_tpu.audio.io import decode_audio
    from audio_rag_tpu.config.schema import ASRConfig

    cfg = ASRConfig(backend=backend if backend != "fake" else "whisper-jax")
    if backend == "fake":
        from audio_rag_tpu.asr.fake import FakeASR

        asr = StreamingASR(cfg, backend=FakeASR())
    else:
        asr = StreamingASR(cfg)
    asr.load()
    audio, sr = decode_audio(path)
    print(f"streaming {len(audio) / sr:.1f}s of audio in 0.5s frames…")
    for result in asr.process_stream(audio):
        print(f"[{result.start:7.2f}-{result.end:7.2f}] "
              f"({result.processing_time_ms:5.0f} ms) {result.text[:80]}")


async def test_with_websocket(path: str, url: str, api_key: str) -> None:
    import websockets

    from audio_rag_tpu.audio.io import decode_audio

    audio, sr = decode_audio(path)
    pcm = (np.clip(audio, -1, 1) * 32767).astype("<i2").tobytes()
    frame_bytes = sr * 2  # 1 s frames

    async with websockets.connect(f"{url}?api_key={api_key}") as ws:
        print(await ws.recv())
        for i in range(0, len(pcm), frame_bytes):
            await ws.send(pcm[i: i + frame_bytes])
            try:
                while True:
                    msg = json.loads(
                        await asyncio.wait_for(ws.recv(), timeout=0.05)
                    )
                    if msg.get("type") == "transcript":
                        print(f"[{msg['start']:7.2f}-{msg['end']:7.2f}] "
                              f"{msg['text'][:80]}")
            except (asyncio.TimeoutError, TimeoutError):
                pass
        await ws.send(json.dumps({"command": "stop"}))
        async for raw in ws:
            msg = json.loads(raw)
            if msg.get("type") == "transcript":
                print(f"[final] {msg['text'][:80]}")
            if msg.get("status") == "stopped":
                break


def test_with_mic(url: str, api_key: str) -> None:
    try:
        import sounddevice  # noqa: F401
    except ImportError:
        print("sounddevice is not installed; mic mode unavailable")
        sys.exit(2)
    raise NotImplementedError  # hardware path, kept behind the gate


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("mode", choices=["file", "ws", "mic"])
    parser.add_argument("--audio", default=None)
    parser.add_argument("--backend", default="fake",
                        help="fake | whisper-jax")
    parser.add_argument(
        "--url", default="ws://127.0.0.1:8000/api/v1/ws/transcribe"
    )
    parser.add_argument("--api-key", default="dev-key-basic")
    args = parser.parse_args()

    from audio_rag_tpu.utils.jax_cache import apply_platform_env

    apply_platform_env()

    if args.mode == "file":
        test_with_file(args.audio, args.backend)
    elif args.mode == "ws":
        asyncio.run(test_with_websocket(args.audio, args.url, args.api_key))
    else:
        test_with_mic(args.url, args.api_key)


if __name__ == "__main__":
    main()
