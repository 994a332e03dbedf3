"""Agglomerative (AHC) diarizer — the second diarization engine.

Parity surface: reference ``diarization/pyannote.py:17-193`` (pyannote's
pipeline: embeddings → agglomerative clustering with a distance threshold,
overlapped-speech handling, per-speaker timeline). Shares the TPU path
with the clustering engine (one batched speaker-embedding call per file,
``clustering.window_embeddings``); only the small N×N linkage runs on
host.

Differences from the spectral engine, mirroring pyannote vs NeMo:

* **threshold-driven speaker count** — clusters merge while the closest
  pair's average cosine distance is below ``ahc_threshold``, so the
  speaker count follows the data instead of an eigengap estimate
  (``num_speakers``/min/max still override);
* **overlap-aware output** — a window whose similarity to its second-
  closest centroid is within ``overlap_margin`` of its best similarity is
  emitted for BOTH speakers, producing overlapping segments (the spectral
  engine is single-label).
"""

from __future__ import annotations

from typing import Any

import numpy as np

from audio_rag_tpu.asr.vad import VADOptions, speech_segments
from audio_rag_tpu.audio.io import decode_audio
from audio_rag_tpu.config.schema import DiarizationConfig
from audio_rag_tpu.core.base import BaseDiarizer
from audio_rag_tpu.core.types import TranscriptSegment
from audio_rag_tpu.diarization.base import DiarizationRegistry
from audio_rag_tpu.diarization.clustering import (
    window_embeddings,
    windows_to_segments,
)
from audio_rag_tpu.engine.engine import get_engine
from audio_rag_tpu.models.speaker import (
    SPEAKER_PRESETS,
    resolve_speaker_params,
)
from audio_rag_tpu.resources.manager import get_resource_manager
from audio_rag_tpu.utils.decorators import timed

__all__ = ["AHCDiarizer", "ahc_cluster"]


def ahc_cluster(
    emb: np.ndarray,  # (N, D) L2-normalized
    threshold: float = 0.35,
    num_speakers: int | None = None,
    min_speakers: int | None = None,
    max_speakers: int | None = None,
) -> np.ndarray:
    """Average-linkage agglomerative clustering on cosine distance.

    Merges the closest cluster pair while its average distance is below
    ``threshold`` (or until ``num_speakers`` clusters remain). O(N³)
    worst-case on the host — N is window count (~hundreds for an hour),
    trivial next to the device work.
    """
    n = emb.shape[0]
    if n == 0:
        return np.zeros(0, np.int64)
    target = num_speakers
    lo = max(min_speakers or 1, 1)
    hi = min(max_speakers or n, n)
    dist = 1.0 - emb @ emb.T
    clusters: list[list[int]] = [[i] for i in range(n)]

    def avg_dist(a: list[int], b: list[int]) -> float:
        return float(dist[np.ix_(a, b)].mean())

    while len(clusters) > 1:
        if target is not None and len(clusters) <= target:
            break
        if len(clusters) <= lo:
            break
        best = (None, None, np.inf)
        for i in range(len(clusters)):
            for j in range(i + 1, len(clusters)):
                d = avg_dist(clusters[i], clusters[j])
                if d < best[2]:
                    best = (i, j, d)
        i, j, d = best
        must_merge = (target is not None and len(clusters) > target) or \
            len(clusters) > hi
        if not must_merge and d > threshold:
            break
        clusters[i] = clusters[i] + clusters[j]
        del clusters[j]

    labels = np.zeros(n, np.int64)
    # stable label order: clusters sorted by first window index
    clusters.sort(key=lambda c: min(c))
    for lab, members in enumerate(clusters):
        labels[members] = lab
    return labels


@DiarizationRegistry.register("ahc")
class AHCDiarizer(BaseDiarizer):
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
        self.dims, params, _src = resolve_speaker_params(
            self.config.checkpoint_path, self.dims,
            allow_asset=self.config.model != "test")
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
        labels = ahc_cluster(
            emb, threshold=self.config.ahc_threshold,
            num_speakers=num_speakers,
            min_speakers=self.config.min_speakers,
            max_speakers=self.config.max_speakers,
        )
        total_end = max(e for _, e in spans)
        segs = windows_to_segments(
            starts, labels, self.config.window_s, self.config.shift_s,
            total_end,
        )

        # overlap-aware pass: a window nearly as close to a second
        # centroid speaks for both (pyannote's overlapped-speech behavior)
        k = int(labels.max()) + 1
        if k >= 2 and self.config.overlap_margin > 0:
            centroids = np.stack([
                emb[labels == c].mean(axis=0) for c in range(k)
            ])
            centroids /= np.maximum(
                np.linalg.norm(centroids, axis=1, keepdims=True), 1e-9)
            sims = emb @ centroids.T  # (N, k)
            order = np.argsort(-sims, axis=1)
            best = sims[np.arange(len(starts)), order[:, 0]]
            second = sims[np.arange(len(starts)), order[:, 1]]
            win = self.config.window_s
            for i, t in enumerate(starts):
                if best[i] - second[i] < self.config.overlap_margin:
                    spk = f"SPEAKER_{int(order[i, 1]):02d}"
                    segs.append(TranscriptSegment(
                        text="", start=round(t, 3),
                        end=round(min(t + win, total_end), 3), speaker=spk,
                    ))
            segs.sort(key=lambda s: (s.start, s.speaker))
        return segs

    def get_speaker_timeline(
        self, segments: list[TranscriptSegment]
    ) -> list[dict[str, Any]]:
        totals: dict[str, float] = {}
        for s in segments:
            if s.speaker:
                totals[s.speaker] = totals.get(s.speaker, 0.0) + s.duration
        return [
            {"speaker": kk, "talk_time": round(v, 3)}
            for kk, v in sorted(totals.items())
        ]
