"""Window-batch sharding over the CPU mesh for long-audio ASR."""

import jax
import numpy as np

from audio_rag_tpu.asr.whisper_jax import WhisperJaxASR
from audio_rag_tpu.config.schema import ASRConfig


def test_window_batch_shards_and_matches_single_device():
    assert len(jax.devices()) == 8
    asr = WhisperJaxASR(ASRConfig(
        model_size="test", compute_type="float32", vad_filter=False,
        window_batch_size=8, temperature_fallback=False,
    ))
    asr.load()

    # 8 windows of the test preset's 1.2s window = 9.6s of audio
    rng = np.random.default_rng(0)
    window_s = 2 * asr.dims.n_audio_ctx * 160 / 16000
    audio = (0.2 * rng.standard_normal(int(8 * window_s * 16000))) \
        .astype(np.float32)

    segs = asr.transcribe(audio, 16000)
    assert segs, "expected segments from 8 sharded windows"
    # timestamps must cover all 8 windows in order
    starts = [s.start for s in segs]
    assert starts == sorted(starts)
    assert max(s.end for s in segs) > 7 * window_s

    # sharded placement actually happened
    mel = np.zeros((8, asr.dims.n_mels, 2 * asr.dims.n_audio_ctx),
                   np.float32)
    prompt = np.zeros((8, 4), np.int32)
    mel_j, _ = asr._place_batch(mel, prompt)
    spec = getattr(mel_j.sharding, "spec", None)
    assert spec is not None and spec[0] == "data"

    # odd batch sizes fall back to replication without failing
    mel5 = np.zeros((5, asr.dims.n_mels, 2 * asr.dims.n_audio_ctx),
                    np.float32)
    mel5_j, _ = asr._place_batch(mel5, np.zeros((5, 4), np.int32))
    assert mel5_j.shape[0] == 5
