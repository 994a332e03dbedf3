"""External TTS backends (piper, edge-tts), gated on availability.

Parity surface: reference ``tts/piper.py:15-143`` (local piper with CLI
fallback) and ``tts/edge.py:14-106`` (MS Edge online voices). Both engines
are optional dependencies; when absent, ``load()`` raises TTSError and the
orchestrator falls back per ``tts.fallback_backend``.
"""

from __future__ import annotations

import shutil
import subprocess
import tempfile
from pathlib import Path

from audio_rag_tpu.config.schema import TTSConfig
from audio_rag_tpu.core.base import BaseTTS
from audio_rag_tpu.core.exceptions import TTSError
from audio_rag_tpu.tts.base import TTSRegistry

__all__ = ["PiperTTS", "EdgeTTS", "EDGE_VOICES"]

EDGE_VOICES = {
    "en": "en-US-AriaNeural",
    "es": "es-ES-ElviraNeural",
    "fr": "fr-FR-DeniseNeural",
    "de": "de-DE-KatjaNeural",
    "hi": "hi-IN-SwaraNeural",
}


@TTSRegistry.register("piper")
class PiperTTS(BaseTTS):
    hbm_required_gb = 0.0

    def __init__(self, config: TTSConfig | None = None):
        super().__init__()
        self.config = config or TTSConfig()

    def _load(self) -> None:
        if shutil.which("piper") is None:
            try:
                import piper  # noqa: F401
            except ImportError:
                raise TTSError(
                    "piper is not installed (neither CLI nor python module)",
                    context={"backend": "piper"},
                ) from None

    def synthesize(self, text: str, output_path: str | None = None) -> bytes:
        self.require_loaded()
        out = Path(output_path) if output_path else Path(
            tempfile.mkstemp(suffix=".wav")[1]
        )
        cli = shutil.which("piper")
        if cli:
            proc = subprocess.run(
                [cli, "--model", self.config.model, "--output_file", str(out)],
                input=text.encode(), capture_output=True, timeout=120,
            )
            if proc.returncode != 0:
                raise TTSError(
                    f"piper failed: {proc.stderr.decode()[:300]}",
                    context={"backend": "piper"},
                )
        else:
            import piper

            voice = piper.PiperVoice.load(self.config.model)
            with open(out, "wb") as f:
                voice.synthesize(text, f)
        data = out.read_bytes()
        if not output_path:
            out.unlink(missing_ok=True)
        return data


@TTSRegistry.register("edge-tts")
class EdgeTTS(BaseTTS):
    hbm_required_gb = 0.0

    def __init__(self, config: TTSConfig | None = None, language: str = "en"):
        super().__init__()
        self.config = config or TTSConfig()
        self.language = language

    def _load(self) -> None:
        try:
            import edge_tts  # noqa: F401
        except ImportError:
            raise TTSError(
                "edge-tts is not installed",
                context={"backend": "edge-tts"},
            ) from None

    def synthesize(self, text: str, output_path: str | None = None) -> bytes:
        self.require_loaded()
        import asyncio

        import edge_tts

        voice = EDGE_VOICES.get(self.language, EDGE_VOICES["en"])

        async def run() -> bytes:
            com = edge_tts.Communicate(text, voice)
            chunks = []
            async for piece in com.stream():
                if piece["type"] == "audio":
                    chunks.append(piece["data"])
            return b"".join(chunks)

        data = asyncio.run(run())
        if output_path:
            with open(output_path, "wb") as f:
                f.write(data)
        return data
