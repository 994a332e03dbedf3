"""Time-axis-sharded mel (halo exchange over the data axis) must match the
unsharded full-file computation exactly, and the batched per-window mel
must match the per-window loop it replaced."""

import jax
import numpy as np
import pytest

from audio_rag_tpu.ops.mel import (
    HOP_LENGTH,
    log_mel_batch,
    log_mel_sharded,
    log_mel_spectrogram,
)
from audio_rag_tpu.parallel.mesh import create_mesh


@pytest.fixture(scope="module")
def mesh8():
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs the 8-device CPU mesh")
    return create_mesh(data_axis=8, model_axis=1, devices=devs[:8])


@pytest.mark.parametrize("seconds", [1.0, 3.2, 7.5])
def test_sharded_matches_unsharded(mesh8, seconds):
    rng = np.random.default_rng(0)
    n = int(seconds * 16000)
    audio = (0.3 * rng.standard_normal(n)).astype(np.float32)
    out_s = np.asarray(log_mel_sharded(audio, n_mels=80, mesh=mesh8))
    # reference: unsharded over the SAME padded length (pad to the shard
    # grid, as the sharded path does)
    step = 8 * HOP_LENGTH
    n_pad = ((n + step - 1) // step) * step
    padded = np.zeros(n_pad, np.float32)
    padded[:n] = audio
    out_r = np.asarray(log_mel_spectrogram(jax.numpy.asarray(padded),
                                           n_mels=80))
    assert out_s.shape == out_r.shape
    np.testing.assert_allclose(out_s, out_r, atol=2e-5, rtol=1e-5)


def test_halo_exchange_is_exact_at_shard_boundaries(mesh8):
    """A click placed exactly at a shard boundary exercises the halo: its
    energy must appear identically in frames on BOTH sides."""
    n = 8 * HOP_LENGTH * 100  # 100 frames per shard
    audio = np.zeros(n, np.float32)
    boundary = n // 8  # first shard boundary
    audio[boundary - 2: boundary + 2] = 1.0
    out_s = np.asarray(log_mel_sharded(audio, n_mels=80, mesh=mesh8))
    out_r = np.asarray(log_mel_spectrogram(jax.numpy.asarray(audio),
                                           n_mels=80))
    np.testing.assert_allclose(out_s, out_r, atol=2e-5, rtol=1e-5)


def test_single_device_mesh_falls_back(mesh8):
    mesh1 = create_mesh(1, 1, jax.devices()[:1])
    audio = np.random.default_rng(1).standard_normal(16000).astype(np.float32)
    out = np.asarray(log_mel_sharded(audio, n_mels=80, mesh=mesh1))
    ref = np.asarray(log_mel_spectrogram(jax.numpy.asarray(audio), n_mels=80))
    np.testing.assert_allclose(out, ref, atol=1e-6)


def test_log_mel_batch_matches_loop():
    rng = np.random.default_rng(2)
    wins = (0.2 * rng.standard_normal((3, 32000))).astype(np.float32)
    batched = np.asarray(log_mel_batch(jax.numpy.asarray(wins), n_mels=80))
    for j in range(3):
        ref = np.asarray(log_mel_spectrogram(
            jax.numpy.asarray(wins[j]), n_mels=80))
        np.testing.assert_allclose(batched[j], ref, atol=1e-6)
