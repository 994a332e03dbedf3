"""Diarization error rate (DER) — the self-check the reference never
shipped (it relied on pyannote.metrics externally).

Standard NIST-style DER over frame discretization: miss + false alarm +
speaker confusion, divided by total reference speech time, after an
optimal one-to-one speaker mapping (Hungarian assignment on the overlap
matrix). Supports overlapped speech on both sides (frames carry speaker
SETS) and the usual forgiveness collar around reference boundaries.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from audio_rag_tpu.core.types import TranscriptSegment

__all__ = ["DERResult", "diarization_error_rate"]

_FRAME = 0.01  # 10 ms discretization


@dataclass
class DERResult:
    der: float
    miss: float
    false_alarm: float
    confusion: float
    total_speech: float

    def to_dict(self) -> dict:
        return {
            "der": self.der, "miss": self.miss,
            "false_alarm": self.false_alarm, "confusion": self.confusion,
            "total_speech": self.total_speech,
        }


def _frame_sets(segments: list[TranscriptSegment], n_frames: int,
                speakers: list[str]) -> np.ndarray:
    """(n_frames, n_speakers) bool activity matrix."""
    idx = {s: i for i, s in enumerate(speakers)}
    act = np.zeros((n_frames, len(speakers)), bool)
    for seg in segments:
        a = max(int(round(seg.start / _FRAME)), 0)
        b = min(int(round(seg.end / _FRAME)), n_frames)
        if seg.speaker in idx and b > a:
            act[a:b, idx[seg.speaker]] = True
    return act


def diarization_error_rate(
    reference: list[TranscriptSegment],
    hypothesis: list[TranscriptSegment],
    collar: float = 0.25,
) -> DERResult:
    """DER = (miss + false alarm + confusion) / reference speech time.

    ``collar`` seconds around every reference segment boundary are
    excluded from scoring (NIST convention, pyannote's default 0.25 s).
    """
    from scipy.optimize import linear_sum_assignment

    end = max(
        [s.end for s in reference] + [s.end for s in hypothesis] + [0.0]
    )
    n = int(np.ceil(end / _FRAME)) + 1
    ref_spk = sorted({s.speaker for s in reference if s.speaker})
    hyp_spk = sorted({s.speaker for s in hypothesis if s.speaker})
    ref = _frame_sets(reference, n, ref_spk)
    hyp = _frame_sets(hypothesis, n, hyp_spk)

    scored = np.ones(n, bool)
    if collar > 0:
        c = int(round(collar / _FRAME))
        for seg in reference:
            for edge in (seg.start, seg.end):
                a = max(int(round(edge / _FRAME)) - c, 0)
                scored[a: int(round(edge / _FRAME)) + c] = False
    ref = ref[scored]
    hyp = hyp[scored]

    # optimal speaker mapping on total overlap (frames both active)
    if ref_spk and hyp_spk:
        overlap = ref.astype(np.int64).T @ hyp.astype(np.int64)
        ri, hi = linear_sum_assignment(-overlap)
        mapping = dict(zip(hi.tolist(), ri.tolist()))
    else:
        mapping = {}
    hyp_mapped = np.zeros_like(ref)
    for h_idx in range(len(hyp_spk)):
        col = hyp[:, h_idx]
        if h_idx in mapping:
            hyp_mapped[:, mapping[h_idx]] |= col

    n_ref = ref.sum(axis=1).astype(np.int64)
    n_hyp = hyp.sum(axis=1).astype(np.int64)
    n_correct = (ref & hyp_mapped).sum(axis=1).astype(np.int64)
    # NIST decomposition per frame
    miss = np.maximum(n_ref - n_hyp, 0).sum()
    fa = np.maximum(n_hyp - n_ref, 0).sum()
    confusion = (np.minimum(n_ref, n_hyp) - n_correct).clip(min=0).sum()
    total = n_ref.sum()
    scale = _FRAME
    der = float((miss + fa + confusion) / total) if total else 0.0
    return DERResult(
        der=round(der, 4),
        miss=round(float(miss) * scale, 3),
        false_alarm=round(float(fa) * scale, 3),
        confusion=round(float(confusion) * scale, 3),
        total_speech=round(float(total) * scale, 3),
    )
