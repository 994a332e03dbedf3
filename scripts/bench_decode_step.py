"""On-chip decode-STEP decomposition at the production ASR profile.

bench.py's round-5 split shows decode achieving ~160 GB/s of the
819 GB/s bound (19%), while the per-layer kernels individually measure
near speed-of-light (scripts/bench_decode_kernels.py) — so the gap
lives in the assembled step. This times the REAL
:func:`models.whisper.decoder_step` (32 unrolled layers + lm_head +
argmax + cache update) as an in-program fori_loop, and A/Bs the
decisions that matter at the step level:

* cross-KV int4 (record profile) vs int8 — the kernel table says q8 is
  ~2x faster per layer but doubles the KV bytes; which wins inside the
  full step at wb32 decides the record profile's cross-KV width;
* int8+int4-lm_head weights vs bf16 weights — the weight-read share;
* B=32 vs B=16 — separates B-invariant (weights, fixed glue) from
  per-window (KV) cost.

Timing per CLAUDE.md microbench rules: (n, 2n) in-program loops, carry
perturbs inputs, outputs consumed; the (n, 2n) difference cancels the
dispatch floor. Run: python scripts/bench_decode_step.py
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def log(m):
    print(m, file=sys.stderr, flush=True)


def main() -> int:
    from audio_rag_tpu.utils.jax_cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from audio_rag_tpu.models.whisper import (
        WHISPER_PRESETS,
        decoder_step,
        init_whisper,
        precompute_cross_kv,
        quantize_decoder_weights,
    )

    dims = WHISPER_PRESETS["large-v3"]
    L, H = dims.n_text_layer, dims.n_text_head
    hd = dims.n_text_state // H
    C = 224
    Ta = dims.n_audio_ctx
    N_LOOP = 24

    params = jax.jit(
        lambda k: init_whisper(k, dims, storage_dtype=jnp.bfloat16)
    )(jax.random.PRNGKey(0))
    q8 = jax.jit(
        lambda p: quantize_decoder_weights(p, dims, 8, lm_head_bits=4)
    )(params)

    rng = np.random.default_rng(0)

    def make_ops(B, bits, ta=None, c=None):
        ta = ta or Ta
        enc = jnp.asarray(
            rng.standard_normal((B, ta, dims.n_text_state)), jnp.bfloat16)
        ckv = jax.jit(
            lambda p, e: precompute_cross_kv(
                p, dims, e, jnp.bfloat16, quantize=bits is not None,
                bits=bits or 8),
            static_argnames=(),
        )(params, enc)
        sk = jnp.zeros((L, B, H, c or C, hd), jnp.bfloat16)
        sv = jnp.zeros_like(sk)
        tok = jnp.full((B,), 100, jnp.int32)
        return ckv, sk, sv, tok

    def step_loop(n, use_q8, c=None):
        def run(params, q8v, ckv, sk, sv, tok):
            def body(i, carry):
                tok, sk, sv = carry
                logits, (sk, sv) = decoder_step(
                    params, dims, tok[:, None], ckv, i % (c or C), (sk, sv),
                    dtype=jnp.bfloat16, q8=q8v if use_q8 else None)
                nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
                return nxt, sk, sv
            tok, sk, sv = jax.lax.fori_loop(0, n, body, (tok, sk, sv))
            return tok.sum() + sk.astype(jnp.float32).sum()
        return run

    def timed(use_q8, ops, n=N_LOOP, c=None):
        f_n = jax.jit(lambda *a: step_loop(n, use_q8, c)(*a))
        f_2n = jax.jit(lambda *a: step_loop(2 * n, use_q8, c)(*a))
        args = (params, q8, *ops)
        np.asarray(f_n(*args)); np.asarray(f_2n(*args))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter(); np.asarray(f_n(*args))
            t1 = time.perf_counter(); np.asarray(f_2n(*args))
            t2 = time.perf_counter()
            ts.append((t2 - t1) - (t1 - t0))
        return float(np.median(ts)) / n * 1000.0

    results = {}
    for label, B, bits, use_q8, ta, c in (
        ("wb32_ckv4_w8", 32, 4, True, None, None),   # the record profile
        ("wb32_ckv8_w8", 32, 8, True, None, None),   # cross int8 A/B
        ("wb32_ckv4_bf16w", 32, 4, False, None, None),  # weight share
        ("wb16_ckv4_w8", 16, 4, True, None, None),   # B scaling
        ("wb16_ckv8_w8", 16, 8, True, None, None),   # r4 serving profile
        # shape ablations (in-situ component shares by nulling bytes):
        ("wb32_ckv4_w8_ta128", 32, 4, True, 128, None),  # -cross bytes
        ("wb32_ckv4_w8_c32", 32, 4, True, None, 32),     # -self bytes
    ):
        ops = make_ops(B, bits, ta=ta, c=c)
        ms = timed(use_q8, ops, c=c)
        results[label] = round(ms, 3)
        log(f"{label}: {ms:.3f} ms/step")
        del ops

    print(json.dumps({"metric": "asr_decode_step_ms", "results": results,
                      "loops": N_LOOP, "note": "in-program (n,2n) "
                      "differenced; 32-layer unrolled decoder_step + "
                      "lm_head + argmax + cache update"}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
