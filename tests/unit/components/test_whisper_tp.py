"""Tensor-parallel Whisper inference over the mesh's ``model`` axis.

The reference scales ASR only by whole-jobs-per-GPU-worker (SURVEY §2.4);
here the decode loop's per-token weight read — the memory-bound term that
caps single-chip ASR MFU (docs/PERFORMANCE.md) — splits across chips via
``whisper_param_spec`` placement, with XLA emitting the per-block psums.
Parity gate: TP-sharded decode must produce the single-device output.
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from audio_rag_tpu.models.whisper import (
    WHISPER_PRESETS,
    SpecialTokens,
    encode,
    greedy_decode,
    init_whisper,
    whisper_param_spec,
)
from audio_rag_tpu.parallel.mesh import create_mesh

DIMS = WHISPER_PRESETS["test"]
TOKENS = SpecialTokens.for_dims(DIMS)


def _decode(params, mel, prompt):
    enc = encode(params, DIMS, mel, dtype=jnp.float32)
    toks, lp, nsp = greedy_decode(
        params, DIMS, enc, prompt, max_new_tokens=8, eot=TOKENS.eot,
        dtype=jnp.float32,
    )
    return toks


def test_tp_decode_matches_single_device():
    devs = jax.devices()
    assert len(devs) >= 2
    params = init_whisper(jax.random.PRNGKey(0), DIMS)
    rng = np.random.default_rng(0)
    mel = jnp.asarray(
        rng.standard_normal((2, DIMS.n_mels, 2 * DIMS.n_audio_ctx)),
        jnp.float32,
    )
    prompt = jnp.asarray(
        [[TOKENS.sot, TOKENS.no_timestamps]] * 2, jnp.int32
    )

    mesh = create_mesh(data_axis=1, model_axis=2, devices=devs[:2])
    spec = whisper_param_spec(DIMS)
    placed = jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, spec
    )
    # the spec tree must mirror init_whisper's exactly, and column/row
    # splits must land on shardable axes
    a_leaf = placed["decoder"]["blocks"]["attn"]["q"]["w"]
    assert a_leaf.sharding.spec == P(None, None, "model")

    toks_tp = np.asarray(jax.jit(_decode)(placed, mel, prompt))
    toks_ref = np.asarray(jax.jit(_decode)(params, mel, prompt))
    np.testing.assert_array_equal(toks_tp, toks_ref)


def test_backend_loads_tp_and_transcribes():
    """WhisperJaxASR on a model-axis mesh: sharded placement, int8 paths
    self-disable (Pallas kernels are single-device), transcribe parity
    with a single-device backend run."""
    from audio_rag_tpu.asr.whisper_jax import WhisperJaxASR
    from audio_rag_tpu.config.schema import ASRConfig
    from audio_rag_tpu.engine.engine import InferenceEngine, set_engine
    from audio_rag_tpu.parallel.mesh import set_default_mesh

    devs = jax.devices()
    rng = np.random.default_rng(1)
    window_s = 2 * DIMS.n_audio_ctx * 160 / 16000
    audio = (0.2 * rng.standard_normal(int(2 * window_s * 16000))) \
        .astype(np.float32)
    base_cfg = dict(
        model_size="test", compute_type="float32", vad_filter=False,
        window_batch_size=2, temperature_fallback=False,
    )

    def run(mesh, **extra):
        set_engine(InferenceEngine(mesh=mesh))
        set_default_mesh(mesh)
        asr = WhisperJaxASR(ASRConfig(**base_cfg, **extra))
        asr.load()
        try:
            segs = asr.transcribe(audio, 16000)
            q_leaf = asr._params["decoder"]["blocks"]["attn"]["q"]["w"]
            spec = getattr(q_leaf.sharding, "spec", None)
            return segs, spec, asr._cross_kv_bits, asr._params_q8
        finally:
            asr.unload()
            set_engine(None)
            set_default_mesh(None)

    # TP run with int8 requested: the gate turns both paths off (the
    # Pallas kernels are single-device), so the decode is full-precision
    tp_mesh = create_mesh(data_axis=1, model_axis=2, devices=devs[:2])
    segs_tp, spec_tp, kv8_tp, q8_tp = run(
        tp_mesh, cross_kv_int8=True, decoder_int8=True
    )
    assert spec_tp == P(None, None, "model")
    assert kv8_tp == 0 and q8_tp is None  # int8 gated off under TP

    # single-device, int8 off: the same full-precision computation —
    # TP-sharded output must match it exactly
    one_mesh = create_mesh(data_axis=1, model_axis=1, devices=devs[:1])
    segs_one, spec_one, kv8_one, _ = run(one_mesh)
    assert [s.text for s in segs_tp] == [s.text for s in segs_one]
    np.testing.assert_allclose(
        [s.start for s in segs_tp], [s.start for s in segs_one]
    )

    # a reload on a 1-device mesh re-derives the int8 switches from config
    set_engine(InferenceEngine(mesh=one_mesh))
    set_default_mesh(one_mesh)
    asr = WhisperJaxASR(ASRConfig(**base_cfg, cross_kv_int8=True))
    try:
        asr.load()
        assert asr._cross_kv_bits == 8
    finally:
        asr.unload()
        set_engine(None)
        set_default_mesh(None)
