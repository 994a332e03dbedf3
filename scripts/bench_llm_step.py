"""On-chip microbenchmark: llama decode-step cost decomposition.

bench.py measured the single-stream answer path at ~30 ms/generated token
on llama-3.2-3b int8 — ~13% of the 3.2 GB/step weight-read's HBM
speed-of-light (3.9 ms at 819 GB/s). This decomposes one decode step into
its matmuls + attention + glue to find where the time goes, using the
two-point in-program-loop method (CLAUDE.md: the relay's per-dispatch cost
is variable up to seconds; subtracting a separately measured floor is
wrong — (t(2n) - t(n)) / n cancels it exactly).

Also A/Bs the candidate fixes before they're wired in:
  * fused QKV / fused gate+up matmuls (fewer, larger kernel launches);
  * B=16 vs B=1 rows (the M-dimension latency hypothesis).

Run: python scripts/bench_llm_step.py [model]
"""

from __future__ import annotations

import functools
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

LOOPS = 256


def main() -> int:
    import jax
    import jax.numpy as jnp

    from audio_rag_tpu.models.llm import LLM_PRESETS, init_llm, quantize_llm_weights, llm_decode_step
    from audio_rag_tpu.ops.pallas_kernels import matmul_q8w
    from audio_rag_tpu.utils.jax_cache import enable_compilation_cache

    enable_compilation_cache()
    print("devices:", jax.devices(), flush=True)

    model = sys.argv[1] if len(sys.argv) > 1 else "llama-3.2-3b"
    dims = LLM_PRESETS[model]
    d, ff, v = dims.d_model, dims.d_ff, dims.vocab
    kv_d = dims.n_kv_heads * (d // dims.n_heads)
    rng = np.random.default_rng(0)

    def q8_operand(din, dout):
        w8 = jnp.asarray(rng.integers(-127, 128, (din, dout), dtype=np.int8))
        s = jnp.asarray(rng.uniform(0.005, 0.02, dout).astype(np.float32))
        return w8, s

    def looped(fn, n):
        @jax.jit
        def run(x0, *ops):
            def body(i, acc):
                out = fn(x0 + acc * 1e-20, *ops)
                return acc + jnp.sum(out).astype(jnp.float32)
            return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))
        return run

    def timed(run, ops):
        np.asarray(run(*ops))
        times = []
        for _ in range(5):
            t = time.perf_counter()
            np.asarray(run(*ops))
            times.append(time.perf_counter() - t)
        return float(np.median(times))

    def per_op(fn, ops):
        t1 = timed(looped(fn, LOOPS), ops)
        t2 = timed(looped(fn, 2 * LOOPS), ops)
        return (t2 - t1) / LOOPS

    # --- individual matmul shapes (B=16 rows: the linear_q8 row pad) ----
    shapes = [
        ("q/o   (d,d)", d, d),
        ("k/v   (d,kv)", d, kv_d),
        ("gate/up (d,ff)", d, ff),
        ("down  (ff,d)", ff, d),
        ("lm_head (d,V)", d, v),
        ("FUSED qkv (d,d+2kv)", d, d + 2 * kv_d),
        ("FUSED gateup (d,2ff)", d, 2 * ff),
    ]
    import os
    B = 16
    if os.environ.get("STEP_ONLY") == "1":
        shapes = []
    print(f"\n-- matmul_q8w vs bf16 dot, rows={B} ({model}) --", flush=True)
    totals_q8: dict[str, float] = {}
    for name, din, dout in shapes:
        x = jnp.asarray(rng.standard_normal((B, din)).astype(np.float32))
        w8, s = q8_operand(din, dout)
        wb = (w8.astype(jnp.bfloat16) * s.astype(jnp.bfloat16)[None, :])

        # operands are explicit args, never closures: a closure-captured
        # jax.Array is baked into the program as a literal — the 394 MB
        # lm_head weight 413'd the remote-compile relay that way
        t_q8 = per_op(lambda xx, w8, s: matmul_q8w(
            xx.astype(jnp.bfloat16), w8, s), (x, w8, s))
        t_bf = per_op(lambda xx, wb: jnp.dot(
            xx.astype(jnp.bfloat16), wb,
            preferred_element_type=jnp.float32), (x, wb))
        bw_q8 = din * dout / t_q8 / 1e9
        bw_bf = 2 * din * dout / t_bf / 1e9
        totals_q8[name] = t_q8
        print(f"{name:22s} q8 {t_q8 * 1e3:7.3f} ms ({bw_q8:4.0f} GB/s)   "
              f"bf16 {t_bf * 1e3:7.3f} ms ({bw_bf:4.0f} GB/s)", flush=True)

    if totals_q8:
        per_layer = (2 * totals_q8["q/o   (d,d)"]
                     + 2 * totals_q8["k/v   (d,kv)"]
                     + 3 * totals_q8["gate/up (d,ff)"])
        fused_layer = (totals_q8["FUSED qkv (d,d+2kv)"]
                       + totals_q8["q/o   (d,d)"]
                       + totals_q8["FUSED gateup (d,2ff)"]
                       + totals_q8["down  (ff,d)"])
        print(f"\nmatmul sum/layer: split {per_layer * 1e3:.3f} ms, "
              f"fused {fused_layer * 1e3:.3f} ms; x{dims.n_layers} layers "
              f"+ lm_head → split {1e3 * (per_layer * dims.n_layers + totals_q8['lm_head (d,V)']):.1f} ms, "
              f"fused {1e3 * (fused_layer * dims.n_layers + totals_q8['lm_head (d,V)']):.1f} ms",
              flush=True)

    # --- full decode step: (B, C, q8?) grid ---------------------------
    # The C sweep separates cache-size-dependent terms (KV scatter, GQA
    # expansion, attention reads) from fixed per-layer glue; q8 vs bf16
    # separates weight reads from everything else.
    params = init_llm(jax.random.PRNGKey(0), dims,
                      storage_dtype=jnp.bfloat16)
    q8_full = quantize_llm_weights(params, dims)
    step_grid = ((1, 1024, True), (1, 256, True), (1, 2048, True),
                 (16, 1024, True), (1, 1024, False))
    if os.environ.get("GEN_ONLY") == "1":
        step_grid = ()
    for B_step, C, use_q8 in step_grid:
        q8 = q8_full if use_q8 else None
        hd = d // dims.n_heads
        ck = jnp.zeros((dims.n_layers, B_step, dims.n_kv_heads, C, hd),
                       jnp.bfloat16)
        cv = jnp.zeros_like(ck)
        tok = jnp.full((B_step,), 42, jnp.int32)
        pos = jnp.full((B_step,), 200, jnp.int32)

        # params/q8 as explicit jit args (closure capture would bake ~10 GB
        # of weights into the compile payload). The cache is THREADED
        # through the loop carry — discarding it lets XLA drop the KV
        # scatter and whatever copies it implies (a discarded-cache
        # version measured 5.4 ms/step while the real llm_generate loop
        # paid ~38 ms/token: the difference IS the carried-cache update).
        @functools.partial(jax.jit, static_argnames=("n",))
        def run(params, q8, tok0, ck, cv, pos, n):
            def body(i, state):
                acc, ck, cv = state
                logits, ck, cv = llm_decode_step(
                    params, dims, (tok0 + acc.astype(jnp.int32)) % 1000,
                    pos, ck, cv, q8=q8)
                return (acc + (jnp.sum(logits) * 1e-20).astype(jnp.float32),
                        ck, cv)
            out = jax.lax.fori_loop(0, n, body, (jnp.float32(0.0), ck, cv))
            return out[0] + jnp.sum(out[1][0, 0, 0, 0]).astype(jnp.float32)

        STEP_LOOPS = 64

        def timed_n(n):
            np.asarray(run(params, q8, tok, ck, cv, pos, n=n))
            ts = []
            for _ in range(5):
                t = time.perf_counter()
                np.asarray(run(params, q8, tok, ck, cv, pos, n=n))
                ts.append(time.perf_counter() - t)
            return float(np.median(ts))

        t1, t2 = timed_n(STEP_LOOPS), timed_n(2 * STEP_LOOPS)
        per = (t2 - t1) / STEP_LOOPS
        wbytes = sum(
            int(np.prod(w.shape)) * w.dtype.itemsize
            for w in jax.tree.leaves(q8 if use_q8 else params))
        print(f"full decode step B={B_step} C={C} "
              f"{'q8' if use_q8 else 'bf16'}: {per * 1e3:.2f} ms "
              f"({wbytes / per / 1e9:.0f} GB/s effective over "
              f"{wbytes / 1e9:.2f} GB weights)", flush=True)
        del ck, cv

    # --- llm_generate wave loop: per-token cost via token-count delta --
    # The isolated step measures ~5.4 ms but the answer path pays
    # ~38 ms/token; this times the PRODUCT loop (llm_generate) directly.
    # Two max_new_tokens values difference out prefill + dispatch.
    from audio_rag_tpu.models.llm import llm_generate

    prompt = jnp.asarray(
        rng.integers(1, 1000, (1, 16), dtype=np.int32))

    def gen_time(max_new):
        f = jax.jit(functools.partial(
            llm_generate, dims=dims, max_new_tokens=max_new,
            eos_id=-1, temperature=0.0))
        np.asarray(f(params, prompt=prompt, decoder_q8=q8_full))
        ts = []
        for _ in range(5):
            t = time.perf_counter()
            np.asarray(f(params, prompt=prompt, decoder_q8=q8_full))
            ts.append(time.perf_counter() - t)
        return float(np.median(ts))

    ta, tb = gen_time(32), gen_time(96)
    print(f"llm_generate wave B=1: {(tb - ta) / 64 * 1e3:.2f} ms/token "
          f"(32tok {ta:.3f}s, 96tok {tb:.3f}s)", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
