import numpy as np

from audio_rag_tpu.asr.vad import VADOptions, energy_vad, speech_segments
from audio_rag_tpu.diarization.spectral import (
    estimate_num_speakers,
    spectral_cluster,
)


def clustered_embeddings(n_per=20, k=3, dim=16, seed=0):
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((k, dim)) * 4
    X, y = [], []
    for i in range(k):
        pts = centers[i] + 0.2 * rng.standard_normal((n_per, dim))
        X.append(pts)
        y += [i] * n_per
    X = np.concatenate(X)
    X = X / np.linalg.norm(X, axis=1, keepdims=True)
    return X, np.array(y)


class TestSpectralCluster:
    def test_recovers_clear_clusters(self):
        X, y = clustered_embeddings(k=3)
        labels = spectral_cluster(X, max_speakers=8)
        assert len(set(labels.tolist())) == 3
        # cluster assignments must be consistent within ground-truth groups
        for g in range(3):
            vals = labels[y == g]
            assert len(set(vals.tolist())) == 1

    def test_fixed_num_speakers(self):
        X, _ = clustered_embeddings(k=3)
        labels = spectral_cluster(X, num_speakers=2)
        assert len(set(labels.tolist())) == 2

    def test_single_window(self):
        X = np.ones((1, 8)) / np.sqrt(8)
        assert spectral_cluster(X).tolist() == [0]

    def test_empty(self):
        assert spectral_cluster(np.zeros((0, 8))).size == 0

    def test_eigengap(self):
        # eigenvalues with an obvious gap after index 2 → 2 clusters
        vals = np.array([0.0, 0.01, 0.9, 0.95, 1.0])
        assert estimate_num_speakers(vals, 8) == 2


class TestVAD:
    def test_detects_speech_vs_silence(self):
        sr = 16000
        rng = np.random.default_rng(0)
        silence = np.zeros(sr)
        speech = 0.3 * rng.standard_normal(sr).astype(np.float32)
        audio = np.concatenate([silence, speech, silence]).astype(np.float32)
        spans = speech_segments(audio, sr)
        assert len(spans) == 1
        s, e = spans[0]
        assert 0.8 < s < 1.2 and 1.8 < e < 2.6

    def test_all_silence(self):
        assert speech_segments(np.zeros(16000, np.float32), 16000) == []

    def test_flags_length(self):
        flags = energy_vad(np.zeros(16000, np.float32), 16000,
                           VADOptions(frame_ms=30))
        assert flags.size == 16000 // 480

    def test_short_blips_dropped(self):
        sr = 16000
        audio = np.zeros(sr, np.float32)
        audio[:800] = 0.5  # 50ms blip < min_speech_ms
        assert speech_segments(audio, sr) == []


class TestSubsampledClustering:
    """spectral_cluster beyond MAX_CLUSTER_WINDOWS clusters a temporal
    subsample and assigns the rest by nearest centroid — the eigh is
    O(N^3), measured 24 s host at a 2-hour file's 9600 windows."""

    def _clustered_embeddings(self, n, k=3, d=32, seed=0):
        import numpy as np
        rng = np.random.default_rng(seed)
        centers = rng.standard_normal((k, d))
        centers /= np.linalg.norm(centers, axis=1, keepdims=True)
        true = rng.integers(0, k, n)
        X = centers[true] + 0.05 * rng.standard_normal((n, d))
        X /= np.linalg.norm(X, axis=1, keepdims=True)
        return X, true

    def test_subsample_path_matches_full_path(self, monkeypatch):
        import numpy as np

        from audio_rag_tpu.diarization import spectral

        X, true = self._clustered_embeddings(300)
        full = spectral.spectral_cluster(X, max_speakers=6)
        monkeypatch.setattr(spectral, "MAX_CLUSTER_WINDOWS", 64)
        sub = spectral.spectral_cluster(X, max_speakers=6)
        # identical partitions up to label permutation
        assert len(set(zip(full.tolist(), sub.tolist()))) == \
            len(set(full.tolist()))
        assert (np.unique(sub).size == np.unique(full).size ==
                np.unique(true).size)

    def test_subsample_purity_against_truth(self, monkeypatch):
        import numpy as np

        from audio_rag_tpu.diarization import spectral

        X, true = self._clustered_embeddings(5000, k=4)
        monkeypatch.setattr(spectral, "MAX_CLUSTER_WINDOWS", 512)
        labels = spectral.spectral_cluster(X, max_speakers=8)
        # every predicted cluster maps to one true speaker (purity 1.0
        # at this separation)
        for j in np.unique(labels):
            assert np.unique(true[labels == j]).size == 1

    def test_stranded_kmeans_label_does_not_nan_centroids(self):
        """_kmeans can strand a center (argmin assigns it no points), so
        a subsample label in range(max+1) may be EMPTY. mean() of that
        empty group is a NaN centroid, and argmax picks a NaN column for
        EVERY window — the whole file silently collapsed to one bogus
        speaker before the fix."""
        import numpy as np

        from audio_rag_tpu.diarization.spectral import (
            _nearest_centroid_labels,
        )

        X, true = self._clustered_embeddings(200, k=2)
        sub_idx = np.arange(0, 200, 4)
        # labels {0, 2}: label 1 is stranded (no members)
        sub_labels = np.where(true[sub_idx] == 0, 0, 2).astype(np.int32)
        with np.errstate(invalid="raise"):  # empty-mean would warn/raise
            labels = _nearest_centroid_labels(X, X[sub_idx], sub_labels)
        assert not np.isnan(labels).any()
        assert set(np.unique(labels).tolist()) == {0, 2}
        # assignment follows the true clusters, not a NaN column
        for j in np.unique(labels):
            assert np.unique(true[labels == j]).size == 1

    def test_single_speaker_long_file(self, monkeypatch):
        import numpy as np

        from audio_rag_tpu.diarization import spectral

        X, _ = self._clustered_embeddings(400, k=1)
        monkeypatch.setattr(spectral, "MAX_CLUSTER_WINDOWS", 64)
        labels = spectral.spectral_cluster(X, max_speakers=8)
        assert np.unique(labels).size == 1


class TestBucketedWindowEmbeddings:
    """window_embeddings dispatches fixed-size jitted buckets; results
    must be identical to computing every window in one call (padding
    windows are discarded, params stay explicit args)."""

    def test_bucketed_matches_single_call(self, monkeypatch):
        import jax
        import jax.numpy as jnp
        import numpy as np

        from audio_rag_tpu.config.schema import DiarizationConfig
        from audio_rag_tpu.diarization import clustering
        from audio_rag_tpu.models.speaker import (
            SPEAKER_PRESETS,
            init_speaker_encoder,
            speaker_embed,
        )
        from audio_rag_tpu.ops.mel import log_mel_spectrogram

        dims = SPEAKER_PRESETS["test"]
        params = init_speaker_encoder(jax.random.PRNGKey(0), dims)
        cfg = DiarizationConfig(model="test")
        sr = 16000
        rng = np.random.default_rng(1)
        wav = (0.2 * rng.standard_normal(20 * sr)).astype(np.float32)
        spans = [(0.5, 9.0), (10.0, 19.5)]

        # tiny buckets force multiple dispatches AND tail padding
        monkeypatch.setattr(clustering, "_EMBED_BATCHES", (4, 8))
        starts, emb = clustering.window_embeddings(
            wav, sr, spans, cfg, dims, params)
        assert len(starts) == emb.shape[0] > 8  # multiple buckets used

        win_n = int(cfg.window_s * sr)
        frames = np.zeros((len(starts), win_n), np.float32)
        for i, t in enumerate(starts):
            seg = wav[int(t * sr): int(t * sr) + win_n]
            frames[i, : len(seg)] = seg
        mels = jax.vmap(
            lambda a: log_mel_spectrogram(a, n_mels=dims.n_mels,
                                          global_norm=False)
        )(jnp.asarray(frames))
        ref = np.asarray(speaker_embed(params, dims, mels,
                                       dtype=jnp.float32))
        np.testing.assert_allclose(emb, ref, atol=1e-5)


class TestBenchAudioIsSpeech:
    """bench_common.make_bench_audio must register as speech to the
    LEARNED VAD (the old modulated-noise signal was in its trained
    negative class, which made the bench's diarize stage vacuous —
    0 windows, 0 speakers)."""

    def test_learned_vad_detects_bench_audio(self):
        import sys

        sys.path.insert(0, "/root/repo")
        from bench_common import make_bench_audio

        audio = make_bench_audio(0.5)  # 30 s
        spans = speech_segments(audio, 16000,
                                VADOptions(backend="learned"))
        voiced = sum(e - s for s, e in spans)
        assert voiced > 15.0, f"only {voiced:.1f}s of 30s voiced"
