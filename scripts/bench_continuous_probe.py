"""On-chip probe: where does the continuous batcher's time go?

bench_llm.py measures the wave path at ~2900 tok/s but the continuous
batcher at ~500 on the same model/config. This instruments the batcher's
two device programs directly — per-admission prefill dispatches and
per-segment decode dispatches — plus the host glue between them, using
wall timestamps around each call.

Run: python scripts/bench_continuous_probe.py [model]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> int:
    import jax

    from audio_rag_tpu.config.schema import GenerationConfig
    from audio_rag_tpu.engine.continuous import ContinuousBatcher
    from audio_rag_tpu.generation.llm_jax import LLMGenerator
    from audio_rag_tpu.utils.jax_cache import enable_compilation_cache

    enable_compilation_cache()
    print("devices:", jax.devices(), flush=True)

    model = sys.argv[1] if len(sys.argv) > 1 else "llama-3.2-1b"
    gen = LLMGenerator(GenerationConfig(
        model=model, temperature=0.0, use_scheduler=False,
        decoder_int8=True))
    gen.load()

    import os

    cb = ContinuousBatcher(
        gen, n_slots=8, segment_tokens=16, context_tokens=512,
        pipeline_segments=os.environ.get("BENCH_PIPELINE", "0") == "1")

    # monkey-patch timing around the two device paths
    prefill_times: list[float] = []
    seg_times: list[float] = []
    pipelined = [0]
    orig_admit = cb._admit_many
    orig_proc = cb._process_segment
    orig_disp = cb._dispatch_segment

    def admit(reqs, free_slots):
        t = time.perf_counter()
        orig_admit(reqs, free_slots)
        prefill_times.append(time.perf_counter() - t)

    def disp(chain=None):
        if chain is not None:
            pipelined[0] += 1
        return orig_disp(chain=chain)

    def proc(flight):
        t = time.perf_counter()
        orig_proc(flight)
        seg_times.append(time.perf_counter() - t)

    cb._admit_many = admit
    cb._dispatch_segment = disp
    cb._process_segment = proc

    prompts = [f"Summarize lecture {i} on topic {i * 7 % 23}"
               for i in range(8)]
    try:
        cb.generate(prompts[0], max_tokens=32)  # warm
        for _ in range(2):  # pass 1 pays first-dispatch program init
            prefill_times.clear()
            seg_times.clear()
            t0 = time.perf_counter()
            futs = [cb.submit(p, max_tokens=64) for p in prompts]
            [f.result(timeout=600) for f in futs]
            total = time.perf_counter() - t0
    finally:
        cb.stop()

    print(f"total {total:.3f}s for 512 tokens = {512 / total:.0f} tok/s")
    print(f"prefills: n={len(prefill_times)} "
          f"sum={sum(prefill_times):.3f}s "
          f"each={[round(t * 1e3) for t in prefill_times]} ms")
    print(f"segments: n={len(seg_times)} "
          f"sum={sum(seg_times):.3f}s "
          f"each={[round(t * 1e3) for t in seg_times]} ms")
    acct = sum(prefill_times) + sum(seg_times)
    print(f"accounted {acct:.3f}s; host glue/other {total - acct:.3f}s; "
          f"pipelined dispatches {pipelined[0]}/{len(seg_times)}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
