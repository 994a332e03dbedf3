"""On-chip microbenchmark: beam-search self-KV reorder strategies.

Beam decode restates both (L, B·K, H, C, hd) self caches by source beam
every step; at large-v3 window-batch-8 × beam-5 shapes that is ~3 GB of
read+write per step and is the entire beam-vs-greedy overhead
(docs/PERFORMANCE.md "Beam"). This times the candidate formulations:

  onehot  — 0/1 permutation matmul (T5X trick), the round-3 baseline
  kernel  — scalar-prefetch Pallas permute (ops.beam_reorder_kv)
  copy    — identity read+write of both caches: the bandwidth floor

Iterations CHAIN (each step's output is the next step's input), so the
loop cannot be hoisted, collapsed, or DCE'd; the two-point difference
(t(2n) − t(n))/n cancels the relay's variable per-dispatch cost.

Run: python scripts/bench_beam_reorder.py  [L N H C hd]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

LOOPS = 32


def main() -> int:
    import jax
    import jax.numpy as jnp

    from audio_rag_tpu.ops.pallas_kernels import beam_reorder_kv
    from audio_rag_tpu.utils.jax_cache import enable_compilation_cache

    enable_compilation_cache()
    print("devices:", jax.devices(), flush=True)

    # large-v3 beam bench shapes: window batch 8 x beam 5, C = 4+224
    args = [int(a) for a in sys.argv[1:]] or [32, 40, 20, 228, 64]
    L, N, H, C, hd = args
    rng = np.random.default_rng(0)
    sk = jnp.asarray(rng.standard_normal((L, N, H, C, hd)), jnp.bfloat16)
    sv = jnp.asarray(rng.standard_normal((L, N, H, C, hd)), jnp.bfloat16)
    # a beam-shaped index: per-group permutation with fan-out, like the
    # argmax of a real step (constant across iterations, as in the loop
    # the reorder program is traced once per step anyway)
    K = 5
    src = rng.integers(0, K, size=(N // K, K))
    idx = jnp.asarray(
        (np.arange(N // K)[:, None] * K + src).reshape(-1), jnp.int32)

    def onehot(k, v, g):
        oh = jax.nn.one_hot(g, N, dtype=k.dtype)
        return (jnp.einsum("nb,lbhcd->lnhcd", oh, k),
                jnp.einsum("nb,lbhcd->lnhcd", oh, v))

    def kernel(k, v, g):
        return beam_reorder_kv(k, v, g)

    def copy(k, v, g):
        # identity read+write (bandwidth floor); the +tiny defeats a
        # no-op fold while staying bitwise-negligible
        eps = jnp.bfloat16(1e-30)
        return k + eps, v + eps

    def looped(fn, n):
        @jax.jit
        def run(k0, v0, g):
            def body(i, c):
                return fn(*c, g)
            k, v = jax.lax.fori_loop(0, n, body, (k0, v0))
            return jnp.sum(k.astype(jnp.float32)) + \
                jnp.sum(v.astype(jnp.float32))
        return run

    def timed(run, *ops):
        np.asarray(run(*ops))  # compile + first run
        times = []
        for _ in range(5):
            t = time.perf_counter()
            np.asarray(run(*ops))
            times.append(time.perf_counter() - t)
        return float(np.median(times))

    # layout probe: if the beam dim were OUTERMOST the row slab would be
    # ONE contiguous extent (L*H*C*hd elements) instead of L strided
    # 583 KB extents — all three (L, N, ...) formulations measure the
    # same ~156 GB/s, consistent with a fixed per-extent cost, so this
    # tests whether contiguity is the lever the layout change would buy
    import functools as _ft

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    M = L * H * C * hd // 128
    kf = jnp.asarray(rng.standard_normal((N, M, 128)), jnp.bfloat16)
    vf = jnp.asarray(rng.standard_normal((N, M, 128)), jnp.bfloat16)

    def _flat_dma_kernel(idx_ref, k_in, v_in, k_out, v_out, sems,
                         *, n_chunks):
        n = pl.program_id(0)
        g = idx_ref[n]
        step = k_in.shape[1] // n_chunks
        cps = []
        for c in range(n_chunks):
            sl = pl.ds(c * step, step)
            cps.append(pltpu.make_async_copy(
                k_in.at[g, sl], k_out.at[n, sl], sems.at[0, c]))
            cps.append(pltpu.make_async_copy(
                v_in.at[g, sl], v_out.at[n, sl], sems.at[1, c]))
        for cp in cps:
            cp.start()
        for cp in cps:
            cp.wait()

    def flat_dma(n_chunks):
        any_spec = pl.BlockSpec(memory_space=pl.ANY)
        gs = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(N,),
            in_specs=[any_spec, any_spec],
            out_specs=[any_spec, any_spec],
            scratch_shapes=[pltpu.SemaphoreType.DMA((2, n_chunks))],
        )

        def run(k, v, g):
            return pl.pallas_call(
                _ft.partial(_flat_dma_kernel, n_chunks=n_chunks),
                out_shape=[jax.ShapeDtypeStruct(k.shape, k.dtype),
                           jax.ShapeDtypeStruct(v.shape, v.dtype)],
                grid_spec=gs,
            )(g, k, v)
        return run

    nbytes = 2 * 2 * sk.size * sk.dtype.itemsize  # r+w, both caches
    print(f"shapes L={L} N={N} H={H} C={C} hd={hd}: "
          f"{nbytes / 1e9:.2f} GB touched/step", flush=True)
    def onehot_flat(k, v, g):
        # one-hot matmul at the beam-OUTERMOST layout: no strided beam
        # axis, so the MXU permute should run without the internal
        # transpose the (L, N, ...) einsum pays
        oh = jax.nn.one_hot(g, N, dtype=k.dtype)
        return (jnp.einsum("nb,bmk->nmk", oh, k),
                jnp.einsum("nb,bmk->nmk", oh, v))

    for name, fn in [("flat_dma_x1", flat_dma(1)),
                     ("flat_dma_x8", flat_dma(8)),
                     ("onehot_flat", onehot_flat)]:
        t1 = timed(looped(fn, LOOPS), kf, vf, idx)
        t2 = timed(looped(fn, 2 * LOOPS), kf, vf, idx)
        per = (t2 - t1) / LOOPS
        print(f"{name}: {per * 1e3:.2f} ms/step "
              f"({nbytes / per / 1e9:.0f} GB/s effective)", flush=True)
    for name, fn in [("copy", copy), ("kernel", kernel), ("onehot", onehot)]:
        t1 = timed(looped(fn, LOOPS), sk, sv, idx)
        t2 = timed(looped(fn, 2 * LOOPS), sk, sv, idx)
        per = (t2 - t1) / LOOPS
        print(f"{name}: {per * 1e3:.2f} ms/step "
              f"({nbytes / per / 1e9:.0f} GB/s effective)", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
