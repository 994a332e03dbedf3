"""On-chip microbenchmark: whisper decode cross-attention (bf16/int8/int4)
and decode-loop weight matmuls (bf16 / matmul_q8w / matmul_q4w).

The decode loop's dominant HBM terms are re-reading the full cross K/V
and the decoder weights every token (docs/PERFORMANCE.md). This times the
paths at large-v3 shapes (B=16, H=20, hd=64, Ta=1536, one layer, looped
in-program to amortize the relay's ~30 ms dispatch floor).

Measured lineage (v5e), ms per layer-step:

  bf16 einsum                        0.157   (803 GB/s — HBM speed-of-light)
  q8, per-(b, h) grid                0.198   (fixed invocation cost > savings)
  q8, per-row grid + per-head dots   0.140   (M=1 dot latency x 40)
  q8, per-row grid + batched dots    0.058   (production kernel; 2.7x)
  q4, nibble-packed batched dots     0.128   (unpack VPU cost > bandwidth
                                              saved — int4 is a capacity
                                              lever, not a speed lever;
                                              same run re-measured q8 0.067)

Weights (two-point differenced; small shapes are relay-noise-dominated —
only the wide vocab projection is trustworthy): (1280, 51968) bf16
0.215 ms / q8w 0.186 / q4w 0.100 — the one shape where int4 wins.
Full-clip arbiter: all-int4 RTF 0.0067 vs all-int8 0.0059
(docs/bench_runs/asr_int4_wb16.json).

Run: python scripts/bench_decode_kernels.py [cross|weights]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

B, H, HD, TA = 16, 20, 64, 1536
LOOPS = 64


def _timed_factory():
    import numpy as np

    def timed(run, ops):
        np.asarray(run(*ops))  # compile + first run
        times = []
        for _ in range(5):
            t = time.perf_counter()
            np.asarray(run(*ops))
            times.append(time.perf_counter() - t)
        return float(np.median(times))

    return timed


def _looped_factory():
    import jax
    import jax.numpy as jnp

    # loop the op in-program; fold the iteration into the first operand so
    # XLA can't hoist, and consume the full output so it can't DCE
    # (CLAUDE.md microbenchmark pitfalls)
    def looped(fn, n):
        @jax.jit
        def run(x0, *ops):
            def body(i, acc):
                out = fn(x0 + acc * 1e-20, *ops)
                return acc + jnp.sum(out)
            return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))
        return run

    return looped


def bench_weights() -> int:
    """Decode-loop weight matmuls at whisper large-v3 / llama shapes:
    bf16 dot vs matmul_q8w vs matmul_q4w, ms per matmul and effective
    weight-read bandwidth. Decides whether int4's in-kernel unpack cost
    eats its HBM savings (the full-clip A/B measured int4 ≈ int8)."""
    import jax
    import jax.numpy as jnp

    from audio_rag_tpu.models.layers import quantize_linear, quantize_linear_q4
    from audio_rag_tpu.ops.pallas_kernels import matmul_q4w, matmul_q8w
    from audio_rag_tpu.utils.jax_cache import enable_compilation_cache

    enable_compilation_cache()
    print("devices:", jax.devices(), flush=True)
    timed, looped = _timed_factory(), _looped_factory()
    rng = np.random.default_rng(0)

    shapes = [(16, 1280, 1280), (16, 1280, 5120), (16, 5120, 1280),
              (16, 1280, 51968)]
    for Bm, din, dout in shapes:
        x = jnp.asarray(rng.standard_normal((Bm, din)).astype(np.float32))
        w = jnp.asarray(
            (rng.standard_normal((din, dout)) * 0.02).astype(np.float32))
        wb = w.astype(jnp.bfloat16)
        p8 = jax.jit(quantize_linear)(w)
        p4 = jax.jit(quantize_linear_q4)(w)

        def bf16_mm(x, wb):
            return jnp.dot(x.astype(jnp.bfloat16), wb,
                           preferred_element_type=jnp.float32)

        cases = {
            "bf16": (bf16_mm, (x, wb), 2 * din * dout),
            "q8w": (lambda x, w8, s: matmul_q8w(x, w8, s),
                    (x, p8["w8"], p8["s"]), din * dout),
            "q4w": (lambda x, w4, s: matmul_q4w(x, w4, s),
                    (x, p4["w4"], p4["s"]),
                    din * dout // 2 + 4 * p4["s"].size),
        }
        loops = 32 if dout > 10000 else 128
        for name, (fn, ops, nbytes) in cases.items():
            t1 = timed(looped(fn, loops), ops)
            t2 = timed(looped(fn, 2 * loops), ops)
            per = (t2 - t1) / loops
            bw = nbytes / per / 1e9
            print(f"({Bm},{din})x({din},{dout}) {name}: "
                  f"{per * 1e3:.3f} ms  ({bw:.0f} GB/s weight-read)",
                  flush=True)
    return 0


def main() -> int:
    import jax
    import jax.numpy as jnp

    from audio_rag_tpu.ops.pallas_kernels import (
        decode_cross_attention_q4,
        decode_cross_attention_q8,
    )
    from audio_rag_tpu.utils.jax_cache import enable_compilation_cache

    enable_compilation_cache()
    print("devices:", jax.devices(), flush=True)

    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, H, 1, HD)).astype(np.float32))
    kb = jnp.asarray(
        rng.standard_normal((B, H, TA, HD)).astype(np.float32)
    ).astype(jnp.bfloat16)
    vb = jnp.asarray(
        rng.standard_normal((B, H, TA, HD)).astype(np.float32)
    ).astype(jnp.bfloat16)
    k8 = jnp.asarray(rng.integers(-127, 128, (B, H, HD, TA), dtype=np.int8))
    v8 = jnp.asarray(rng.integers(-127, 128, (B, H, HD, TA), dtype=np.int8))
    ks = jnp.asarray(rng.uniform(0.01, 0.1, (B, H, 1, 1)).astype(np.float32))
    vs = jnp.asarray(rng.uniform(0.01, 0.1, (B, H, 1, 1)).astype(np.float32))
    k4 = jnp.asarray(
        rng.integers(-128, 128, (B, H, HD // 2, TA), dtype=np.int8))
    v4 = jnp.asarray(
        rng.integers(-128, 128, (B, H, HD // 2, TA), dtype=np.int8))
    ks4 = jnp.asarray(
        rng.uniform(0.01, 0.1, (B, H, 1, HD)).astype(np.float32))
    vs4 = jnp.asarray(
        rng.uniform(0.01, 0.1, (B, H, 1, HD)).astype(np.float32))

    scale = HD ** -0.5

    def bf16_attn(q, k, v):
        s = jnp.einsum("bhqd,bhkd->bhqk", (q * scale).astype(jnp.bfloat16),
                       k, preferred_element_type=jnp.float32)
        p = jax.nn.softmax(s, axis=-1).astype(jnp.bfloat16)
        return jnp.einsum("bhqk,bhkd->bhqd", p, v,
                          preferred_element_type=jnp.float32)

    # loop the op in-program; fold the iteration into q so XLA can't
    # hoist, and consume the full output so it can't DCE (CLAUDE.md
    # microbenchmark pitfalls)
    def looped(fn, n):
        @jax.jit
        def run(q0, *ops):
            def body(i, acc):
                out = fn(q0 + acc * 1e-20, *ops)
                return acc + jnp.sum(out)
            return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))
        return run

    # ks/vs ride as operands, NOT jit-closure constants (a live jax.Array
    # captured in a jit closure degrades all subsequent dispatches —
    # CLAUDE.md; in a microbenchmark that skews the numbers themselves)
    cases = {
        "bf16": (bf16_attn, (q, kb, vb)),
        "q8": (decode_cross_attention_q8, (q, k8, v8, ks, vs)),
        "q4": (decode_cross_attention_q4, (q, k4, v4, ks4, vs4)),
    }

    timed = _timed_factory()

    bytes_bf16 = 2 * B * H * TA * HD * 2
    bytes_int8 = 2 * B * H * TA * HD
    bytes_int4 = B * H * TA * HD
    for name, (fn, ops) in cases.items():
        # two-point difference: (t(2n) - t(n)) / n cancels the relay's
        # per-dispatch cost entirely (it is VARIABLE, up to seconds under
        # congestion — subtracting a separately-measured "floor" is wrong)
        t1 = timed(looped(fn, LOOPS), ops)
        t2 = timed(looped(fn, 2 * LOOPS), ops)
        per = (t2 - t1) / LOOPS
        nbytes = {"bf16": bytes_bf16, "q8": bytes_int8,
                  "q4": bytes_int4}[name]
        bw = nbytes / per / 1e9
        print(f"{name}: {per * 1e3:.3f} ms/layer-step  "
              f"({bw:.0f} GB/s effective)", flush=True)
    return 0


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "weights":
        sys.exit(bench_weights())
    sys.exit(main())
