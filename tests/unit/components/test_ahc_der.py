"""AHC diarizer (second engine) + DER self-check metric."""

import numpy as np
import pytest

from audio_rag_tpu.audio.synth import speech_like
from audio_rag_tpu.config.schema import DiarizationConfig
from audio_rag_tpu.core.types import TranscriptSegment
from audio_rag_tpu.diarization.ahc import AHCDiarizer, ahc_cluster
from audio_rag_tpu.diarization.metrics import diarization_error_rate


def seg(start, end, spk):
    return TranscriptSegment(text="", start=start, end=end, speaker=spk)


class TestAHCCluster:
    def _blobs(self, k=3, n_per=10, dim=16, seed=0):
        rng = np.random.default_rng(seed)
        centers = rng.standard_normal((k, dim)) * 4
        pts = np.concatenate([
            centers[i] + 0.1 * rng.standard_normal((n_per, dim))
            for i in range(k)
        ])
        pts /= np.linalg.norm(pts, axis=1, keepdims=True)
        return pts

    def test_recovers_clear_clusters(self):
        emb = self._blobs(3)
        labels = ahc_cluster(emb, threshold=0.35)
        assert len(set(labels.tolist())) == 3
        for c in range(3):
            assert len(set(labels[c * 10:(c + 1) * 10].tolist())) == 1

    def test_num_speakers_override(self):
        emb = self._blobs(3)
        labels = ahc_cluster(emb, threshold=0.35, num_speakers=2)
        assert len(set(labels.tolist())) == 2

    def test_threshold_one_merges_everything(self):
        emb = self._blobs(3)
        labels = ahc_cluster(emb, threshold=2.0)
        assert len(set(labels.tolist())) == 1

    def test_max_speakers_cap(self):
        emb = self._blobs(5)
        labels = ahc_cluster(emb, threshold=0.0, max_speakers=2)
        assert len(set(labels.tolist())) <= 2

    def test_empty(self):
        assert ahc_cluster(np.zeros((0, 8), np.float32)).size == 0


class TestDER:
    def test_perfect_hypothesis_scores_zero(self):
        ref = [seg(0, 5, "A"), seg(5, 10, "B")]
        assert diarization_error_rate(ref, ref, collar=0.0).der == 0.0

    def test_label_permutation_is_free(self):
        ref = [seg(0, 5, "A"), seg(5, 10, "B")]
        hyp = [seg(0, 5, "SPEAKER_01"), seg(5, 10, "SPEAKER_00")]
        assert diarization_error_rate(ref, hyp, collar=0.0).der == 0.0

    def test_miss_and_false_alarm(self):
        ref = [seg(0, 10, "A")]
        hyp = [seg(0, 5, "X")]  # second half missed
        r = diarization_error_rate(ref, hyp, collar=0.0)
        assert r.miss == pytest.approx(5.0, abs=0.1)
        assert r.der == pytest.approx(0.5, abs=0.02)
        r2 = diarization_error_rate(hyp, ref, collar=0.0)
        assert r2.false_alarm == pytest.approx(5.0, abs=0.1)

    def test_confusion(self):
        ref = [seg(0, 5, "A"), seg(5, 10, "B")]
        hyp = [seg(0, 10, "X")]  # one speaker for everything
        r = diarization_error_rate(ref, hyp, collar=0.0)
        # X maps to one of A/B; the other 5s are confusion
        assert r.confusion == pytest.approx(5.0, abs=0.1)
        assert r.der == pytest.approx(0.5, abs=0.02)

    def test_collar_forgives_boundary_jitter(self):
        ref = [seg(0, 5, "A"), seg(5, 10, "B")]
        hyp = [seg(0, 5.2, "A"), seg(5.2, 10, "B")]
        assert diarization_error_rate(ref, hyp, collar=0.25).der == 0.0
        assert diarization_error_rate(ref, hyp, collar=0.0).der > 0.0

    def test_overlap_counted_on_both_sides(self):
        ref = [seg(0, 10, "A"), seg(4, 6, "B")]  # 2s overlapped
        r = diarization_error_rate(ref, ref, collar=0.0)
        assert r.total_speech == pytest.approx(12.0, abs=0.1)
        assert r.der == 0.0


class TestAHCDiarizerEndToEnd:
    @pytest.fixture(scope="class")
    def diar(self):
        d = AHCDiarizer(DiarizationConfig(
            backend="ahc", model="test", vad_backend="energy",
            overlap_margin=0.0,
        ))
        d.load()
        yield d
        d.unload()

    def test_diarize_produces_segments(self, diar):
        sr = 16000
        audio = np.concatenate([
            speech_like(sr * 3, sr, f0=120.0, seed=0),
            speech_like(sr * 3, sr, f0=260.0, seed=1),
        ])
        segs = diar.diarize(audio, sr)
        assert segs
        assert all(s.speaker.startswith("SPEAKER_") for s in segs)
        # DER self-check runs against a constructed reference
        ref = [seg(0, 3, "A"), seg(3, 6, "B")]
        r = diarization_error_rate(ref, segs)
        assert 0.0 <= r.der

    def test_overlap_margin_emits_second_speaker(self, diar):
        sr = 16000
        audio = np.concatenate([
            speech_like(sr * 3, sr, f0=120.0, seed=0),
            speech_like(sr * 3, sr, f0=260.0, seed=1),
        ])
        base = diar.diarize(audio, sr, num_speakers=2)
        diar.config.overlap_margin = 1.0  # force: everything overlaps
        try:
            over = diar.diarize(audio, sr, num_speakers=2)
        finally:
            diar.config.overlap_margin = 0.0
        # with the forced margin every window is emitted twice
        def covered(segs):
            return sum(s.duration for s in segs)
        assert covered(over) > covered(base) * 1.5
