"""TPU-native neural TTS backend — the runnable first-party replacement for
the reference's external engines (piper at ``tts/piper.py:16-143``, edge-tts
at ``tts/edge.py:33-108``), which need binaries/network this environment
lacks.

Uses the FastSpeech-class acoustic model + Griffin-Lim vocoder from
:mod:`audio_rag_tpu.models.tts`. Ships working out of the box via the
committed trained asset (``assets/tts_small.npz``, trained by
``scripts/train_tts.py`` on the deterministic synthetic charvoice);
FastSpeech/VITS-class weights of the same shape can replace the asset
through the npz format.

TPU-first behavior:
* text is split at sentence/word boundaries into segments, bucketed to
  pow-2 symbol lengths, and each bucket synthesizes as ONE batched device
  program (text→mel→waveform, vocoder included) — the reference's engines
  synthesize serially per request;
* all shapes are static (symbol buckets × a fixed frames-per-symbol cap),
  so every bucket compiles once, ever, under the persistent cache.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from audio_rag_tpu.config.schema import TTSConfig
from audio_rag_tpu.core.base import BaseTTS
from audio_rag_tpu.core.exceptions import TTSError
from audio_rag_tpu.tts.base import TTSRegistry
from audio_rag_tpu.utils.decorators import timed
from audio_rag_tpu.utils.logging import get_logger

logger = get_logger(__name__)

__all__ = ["JaxTTS"]

_SR = 16_000  # the model's native rate (matches the repo's audio stack)
_BUCKETS = (32, 64, 128, 256)  # symbol-length buckets (pow-2, compile-once)
_MAX_BATCH = 16
_GAP_S = 0.12  # silence between segments


def _nest(flat: dict) -> dict:
    tree: dict = {}
    for key, value in flat.items():
        node = tree
        parts = key.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value
    return tree


def _split_segments(text: str, max_len: int) -> list[str]:
    """Sentence-first split into segments of at most ``max_len`` symbols."""
    import re

    out: list[str] = []
    for sent in re.split(r"(?<=[.!?])\s+", text.strip()):
        sent = sent.strip()
        while len(sent) > max_len:
            cut = sent.rfind(" ", 0, max_len)
            if cut <= 0:
                cut = max_len
            out.append(sent[:cut].strip())
            sent = sent[cut:].strip()
        if sent:
            out.append(sent)
    return out or [" "]


@TTSRegistry.register("jax")
class JaxTTS(BaseTTS):
    """Neural text→speech on the TPU mesh (registry backend ``jax``)."""

    hbm_required_gb = 0.05

    def __init__(self, config: TTSConfig | None = None):
        super().__init__()
        self.config = config or TTSConfig()
        self._params = None
        self._dims = None
        self._programs: dict[int, object] = {}
        self._loaded = False
        # serializes load/unload/program-build: concurrent API requests
        # through the query pipeline must not double-load params or
        # double-compile bucket programs (each compile costs minutes via
        # the remote-compile relay), and unload() concurrent with
        # synthesize must not null _params mid-call
        import threading

        self._lock = threading.RLock()

    # -- lifecycle ----------------------------------------------------------

    def load(self) -> None:
        with self._lock:
            self._load_locked()

    def _load_locked(self) -> None:
        if self._loaded:
            return
        import jax
        import jax.numpy as jnp

        from audio_rag_tpu.models.tts import TTS_PRESETS, init_tts

        self._dims = TTS_PRESETS["small"]
        asset = Path(__file__).resolve().parents[1] / "assets" / "tts_small.npz"
        if asset.exists():
            with np.load(asset) as data:
                self._params = _nest({
                    k: jnp.asarray(data[k], jnp.float32) for k in data.files
                })
            logger.info("JaxTTS: loaded trained asset %s", asset.name)
        else:  # still functional (audible, untrained) — same policy as the
            # other model families under random init
            self._params = init_tts(jax.random.PRNGKey(0), self._dims)
            logger.warning("JaxTTS: asset missing, using random init")
        self._loaded = True

    def unload(self) -> None:
        with self._lock:
            self._params = None
            self._programs.clear()
            self._loaded = False

    @property
    def is_loaded(self) -> bool:
        return self._loaded

    # -- synthesis ----------------------------------------------------------

    def _program(self, bucket: int):
        """Jitted (tokens (_MAX_BATCH, bucket)) → (audio, n_frames).

        The batch dim is FIXED at ``_MAX_BATCH`` (callers pad with empty
        rows): a per-chunk-count batch shape would compile a fresh program
        for every distinct segment count — minutes each through this
        environment's remote-compile relay — so each bucket compiles
        exactly once, ever.
        """
        with self._lock:
            return self._program_locked(bucket)

    def _program_locked(self, bucket: int):
        if bucket in self._programs:
            return self._programs[bucket]
        import dataclasses

        import jax
        import jax.numpy as jnp

        from audio_rag_tpu.models.tts import apply_tts, mel_to_audio

        # frames cap: 16/symbol keeps shapes tight (the trained voice tops
        # out ~12 frames/symbol); max_dur clamps predicted durations to
        # frames/bucket so the total can NEVER exceed max_frames — without
        # the clamp, out-of-distribution predictions up to the model's
        # max_dur=32 could silently truncate the tail of the utterance
        frames = min(16 * bucket, 4096)
        dims = dataclasses.replace(
            self._dims, max_text=bucket, max_frames=frames,
            max_dur=min(self._dims.max_dur, frames // bucket),
        )

        @jax.jit
        def run(params, tokens):
            mel, valid, _ = apply_tts(params, dims, tokens)
            audio = jax.vmap(lambda m: mel_to_audio(m, n_iter=32))(mel)
            return audio, jnp.sum(valid, axis=1).astype(jnp.int32)

        self._programs[bucket] = run
        return run

    def _synthesize_pcm(self, text: str) -> np.ndarray:
        """text → float32 PCM at the model's native 16 kHz."""
        import jax
        import jax.numpy as jnp

        with self._lock:
            self._load_locked()  # lazy load is race-safe under the lock
            params = self._params  # local ref survives a concurrent unload

        from audio_rag_tpu.models.tts import HOP_LENGTH, PAD_ID, text_to_ids

        segments = _split_segments(text, _BUCKETS[-1])
        bucket = _BUCKETS[-1]
        longest = max(len(s) for s in segments)
        for b in _BUCKETS:
            if longest <= b:
                bucket = b
                break
        run = self._program(bucket)
        gap = np.zeros(int(_GAP_S * _SR), np.float32)
        pieces: list[np.ndarray] = []
        for base in range(0, len(segments), _MAX_BATCH):
            chunk = segments[base: base + _MAX_BATCH]
            toks = np.full((_MAX_BATCH, bucket), PAD_ID, np.int32)
            for i, s in enumerate(chunk):
                toks[i] = text_to_ids(s, bucket)
            # ONE device interaction for both outputs (the relay charges
            # a flat ~28 ms per host<->device transfer)
            audio, n_frames = jax.device_get(
                run(params, jnp.asarray(toks)))
            for row in range(len(chunk)):
                n = int(n_frames[row]) * HOP_LENGTH
                pieces.append(audio[row, :n])
                pieces.append(gap)
        return np.concatenate(pieces[:-1]) if pieces else gap

    @timed
    def synthesize(self, text: str, output_path: str | None = None) -> bytes:
        if not self._loaded:
            self.load()
        if not text.strip():
            raise TTSError("empty text")
        pcm = self._synthesize_pcm(text)
        sr = self.config.sample_rate
        if sr != _SR:
            from audio_rag_tpu.audio.io import resample

            pcm = resample(pcm, _SR, sr)
        from audio_rag_tpu.audio.io import wav_bytes

        data = wav_bytes(pcm, sr)
        if output_path:
            with open(output_path, "wb") as f:
                f.write(data)
        return data
