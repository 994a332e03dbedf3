"""Clustering diarizer: VAD → windowed speaker embeddings → spectral cluster.

Parity surface: reference ``diarization/nemo.py:19-197`` (NemoDiarizer:
marblenet VAD + titanet embeddings over 1.5 s windows / 0.75 s shift +
clustering with max 8 speakers; RTTM-style segments out). TPU-first: all
windows of the file embed in ONE batched device call; only the tiny
N×N eigendecomposition runs on host.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from audio_rag_tpu.asr.vad import VADOptions, speech_segments
from audio_rag_tpu.audio.io import decode_audio
from audio_rag_tpu.config.schema import DiarizationConfig
from audio_rag_tpu.core.base import BaseDiarizer
from audio_rag_tpu.core.types import TranscriptSegment
from audio_rag_tpu.diarization.base import DiarizationRegistry
from audio_rag_tpu.diarization.spectral import spectral_cluster
from audio_rag_tpu.engine.engine import get_engine
from audio_rag_tpu.models.speaker import (
    SPEAKER_PRESETS,
    resolve_speaker_params,
    speaker_embed,
)
from audio_rag_tpu.ops.mel import log_mel_spectrogram
from audio_rag_tpu.resources.manager import get_resource_manager
from audio_rag_tpu.utils.decorators import timed
from audio_rag_tpu.utils.logging import get_logger

log = get_logger(__name__)

__all__ = ["ClusteringDiarizer"]


#: windows per device dispatch. One eager vmap over ALL windows of a file
#: paid per-op relay dispatches AND a single ~900 MB host operand at a
#: 2-hour file's ~9600 windows; fixed buckets through ONE jitted
#: mel→embed program keep every dispatch at a bounded operand size
#: (512 x 1.5 s f32 = 49 MB) and let jax.jit reuse the compiled program
#: across files. Small buckets bound padding waste for short files.
_EMBED_BATCHES = (64, 512)

_embed_programs: dict = {}


def _embed_program(dims, kind: str = "tdnn"):
    """Jitted (params, frames (B, win_n)) → (B, emb_dim) fp32, cached per
    (SpeakerDims, encoder kind). Params are explicit args (never
    closures) so the program survives engine drop_params/reload without
    re-tracing. ``kind="ecapa"`` routes converted real-weight
    checkpoints through the speechbrain-style fbank frontend +
    :func:`ecapa_embed` instead of the small TDNN."""
    fn = _embed_programs.get((dims, kind))
    if fn is None:
        if kind == "ecapa":
            from audio_rag_tpu.models.ecapa import ecapa_embed, ecapa_fbank

            @jax.jit
            def fn(params, frames):
                fb = jax.vmap(
                    lambda a: ecapa_fbank(a, n_mels=dims.n_mels)
                )(frames)
                return ecapa_embed(params, fb, dtype=jnp.float32)
        else:
            @jax.jit
            def fn(params, frames):
                mels = jax.vmap(
                    lambda a: log_mel_spectrogram(a, n_mels=dims.n_mels,
                                                  global_norm=False)
                )(frames)
                return speaker_embed(params, dims, mels, dtype=jnp.float32)

        _embed_programs[(dims, kind)] = fn
    return fn


def window_embeddings(
    wav: np.ndarray, sr: int, spans: list[tuple[float, float]],
    config: DiarizationConfig, dims, params,
) -> tuple[list[float], np.ndarray]:
    """Window starts + L2-normalized speaker embeddings, batched through
    a jitted fixed-bucket device program (shared by both diarization
    engines)."""
    win = config.window_s
    shift = config.shift_s
    win_n = int(win * sr)
    starts: list[float] = []
    for s, e in spans:
        t = s
        while t + 0.5 * win <= e:  # windows at least half-filled
            starts.append(t)
            t += shift
    if not starts:
        # speech shorter than half a window → single window per span
        starts = [s for s, _ in spans]
    frames = np.zeros((len(starts), win_n), np.float32)
    for i, t in enumerate(starts):
        seg = wav[int(t * sr): int(t * sr) + win_n]
        frames[i, : len(seg)] = seg
    from audio_rag_tpu.models.ecapa import is_ecapa_params

    fn = _embed_program(
        dims, "ecapa" if is_ecapa_params(params) else "tdnn")
    chunks: list[np.ndarray] = []
    base = 0
    n = frames.shape[0]
    while base < n:
        rem = n - base
        batch = next((b for b in _EMBED_BATCHES if rem <= b),
                     _EMBED_BATCHES[-1])
        m = min(batch, rem)
        block = frames[base: base + m]
        if m < batch:
            block = np.concatenate(
                [block, np.zeros((batch - m, win_n), np.float32)])
        chunks.append(np.asarray(fn(params, jnp.asarray(block)))[:m])
        base += m
    emb = np.concatenate(chunks, axis=0)
    return starts, emb


def windows_to_segments(
    starts: list[float], labels: np.ndarray, win: float, shift: float,
    total_end: float,
) -> list[TranscriptSegment]:
    """Labeled windows → merged per-speaker segments (shared)."""
    segs: list[TranscriptSegment] = []
    for t, lab in zip(starts, labels):
        spk = f"SPEAKER_{int(lab):02d}"
        end = t + win
        if segs and segs[-1].speaker == spk and t <= segs[-1].end + shift:
            segs[-1].end = round(end, 3)
        else:
            segs.append(
                TranscriptSegment(text="", start=round(t, 3),
                                  end=round(end, 3), speaker=spk)
            )
    for s in segs:
        s.end = min(s.end, round(total_end, 3))
    return segs


@DiarizationRegistry.register("clustering")
class ClusteringDiarizer(BaseDiarizer):
    hbm_required_gb = 0.5

    def __init__(self, config: DiarizationConfig | None = None):
        super().__init__()
        self.config = config or DiarizationConfig()
        preset = self.config.model if self.config.model in SPEAKER_PRESETS \
            else "titanet-jax"
        self.dims = SPEAKER_PRESETS[preset]
        self._params = None

    def _load(self) -> None:
        engine = self._engine or get_engine()
        self._engine = engine
        rm = get_resource_manager()
        rm.ensure_hbm(self.hbm_required_gb, for_model="diarization")
        self.dims, params, src = resolve_speaker_params(
            self.config.checkpoint_path, self.dims,
            allow_asset=self.config.model != "test")
        log.info("speaker encoder source=%s dims=%s", src, self.dims)
        self._params = engine.put_params("speaker", params)
        rm.register_model("diarization", self.hbm_required_gb, self)

    def _unload(self) -> None:
        if self._engine is not None:
            self._engine.drop_params("speaker")
        self._params = None
        get_resource_manager().unregister("diarization")

    @timed
    def diarize(
        self,
        audio: np.ndarray | str,
        sample_rate: int | None = None,
        num_speakers: int | None = None,
        **kw: Any,
    ) -> list[TranscriptSegment]:
        self.require_loaded()
        wav, sr = decode_audio(audio, sample_rate)
        if wav.size == 0:
            return []

        spans = speech_segments(
            wav, sr,
            VADOptions(
                min_speech_ms=self.config.min_speech_duration_ms or 250,
                backend=self.config.vad_backend,
            ),
        )
        if not spans:
            return []

        starts, emb = window_embeddings(
            wav, sr, spans, self.config, self.dims, self._params)

        labels = spectral_cluster(
            emb,
            max_speakers=self.config.max_speakers or 8,
            num_speakers=num_speakers,
            min_speakers=self.config.min_speakers,
        )
        return windows_to_segments(
            starts, labels, self.config.window_s, self.config.shift_s,
            max(e for _, e in spans),
        )

    def get_speaker_timeline(
        self, segments: list[TranscriptSegment]
    ) -> list[dict[str, Any]]:
        """Per-speaker total talk time (reference pyannote.py:160-193)."""
        totals: dict[str, float] = {}
        for s in segments:
            if s.speaker:
                totals[s.speaker] = totals.get(s.speaker, 0.0) + s.duration
        return [
            {"speaker": k, "talk_time": round(v, 3)}
            for k, v in sorted(totals.items())
        ]
