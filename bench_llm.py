"""LLM serving bench: wave vs continuous batching on the real chip.

Measures (llama-3.2-1b architecture, random init — identical FLOPs to
trained weights):

* wave decode throughput (tokens/s) for a full batch;
* continuous-batching throughput for the same workload;
* mixed load: short-request latency while a long generation occupies the
  pool — the head-of-line case wave batching cannot serve.

Prints ONE JSON line. Usage: python bench_llm.py [model]
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def main() -> None:
    model = sys.argv[1] if len(sys.argv) > 1 else "llama-3.2-1b"

    from audio_rag_tpu.config.schema import GenerationConfig
    from audio_rag_tpu.engine.continuous import ContinuousBatcher
    from audio_rag_tpu.generation.llm_jax import LLMGenerator
    from audio_rag_tpu.utils.jax_cache import enable_compilation_cache

    enable_compilation_cache()
    import os

    decoder_int8 = os.environ.get("BENCH_DECODER_INT8", "0") == "1"
    decoder_int4 = os.environ.get("BENCH_DECODER_INT4", "0") == "1"
    # mixed profile: int8 everywhere + int4 on the 128k-vocab projection
    lm_head_int4 = os.environ.get("BENCH_LM_HEAD_INT4", "0") == "1"
    #: speculative block decode for the wave path (0 = off). Random-init
    #: greedy decode settles into repetition loops, which the n-gram
    #: drafter accepts at a high rate — an upper-bound-ish acceptance
    #: regime; real RAG answers/contextual headers (context-span copying)
    #: sit between that and the no-accept worst case (= status quo cost).
    spec_k = int(os.environ.get("BENCH_SPEC_K", 0))
    idle_seg = int(os.environ.get("BENCH_IDLE_SEG", 0))
    gen = LLMGenerator(GenerationConfig(
        model=model, temperature=0.0, use_scheduler=False,
        decoder_int8=decoder_int8, decoder_int4=decoder_int4,
        lm_head_int4=lm_head_int4, speculative_k=spec_k,
    ))
    gen.load()
    prompts = [
        f"Summarize the key points of lecture {i} about topic {i * 7 % 23}"
        for i in range(8)
    ]

    # token accounting: count ACTUAL generated ids (generator/batcher
    # counters), not re-encoded output text — decode→re-encode of
    # random-init token soup is lossy and undercounted ~1.5x (the
    # bench.py 321.5 vs bench_llm.py 489 discrepancy, VERDICT r2 weak #2)

    # -- wave ---------------------------------------------------------------
    gen.generate_batch(prompts[:8], max_tokens=64)  # warm/compile
    t0 = time.perf_counter()
    out = gen.generate_batch(prompts, max_tokens=64)
    wave_s = time.perf_counter() - t0
    wave_tokens = sum(gen.last_token_counts)
    wave_tps = wave_tokens / wave_s
    log(f"wave: {wave_tokens} tokens in {wave_s:.2f}s = {wave_tps:.0f} tok/s")

    # -- continuous ---------------------------------------------------------
    # spec_k passed explicitly: the batcher defaults it OFF (measured
    # losing at batched slots), and the wave path self-gates to B=1 —
    # BENCH_SPEC_K here A/Bs the batched regimes on purpose
    cb = ContinuousBatcher(
        gen, n_slots=8, segment_tokens=16, context_tokens=512,
        spec_k=spec_k, idle_segment_tokens=idle_seg,
        pipeline_segments=os.environ.get("BENCH_PIPELINE", "0") == "1")
    try:
        # warm/compile EVERY program the measured round will hit: a
        # single generate (R=1 prefill), then a full 8-submit round at
        # the MEASURED max_tokens — long enough generations trigger the
        # pipelined CHAINED segment program, which is its own compile
        # (a shorter warm round never chains and the measured phase
        # then pays the compile: measured 66 vs 154 tok/s)
        cb.generate(prompts[0], max_tokens=32)
        [f.result(timeout=600) for f in
         [cb.submit(p, max_tokens=64) for p in prompts]]
        tok_before = cb.tokens_generated
        t0 = time.perf_counter()
        futures = [cb.submit(p, max_tokens=64) for p in prompts]
        out = [f.result(timeout=600) for f in futures]
        cont_s = time.perf_counter() - t0
        cont_tokens = cb.tokens_generated - tok_before
        cont_tps = cont_tokens / cont_s
        log(f"continuous: {cont_tokens} tokens in {cont_s:.2f}s = "
            f"{cont_tps:.0f} tok/s")

        # -- mixed load: shorts join while a long generation runs ----------
        long_f = cb.submit("Write a very long lecture summary", max_tokens=256)
        time.sleep(0.2)
        short_lat = []
        for i in range(6):
            t1 = time.perf_counter()
            cb.generate(f"Quick answer {i}", max_tokens=8)
            short_lat.append(time.perf_counter() - t1)
        long_running_at_shorts_done = not long_f.done()
        t1 = time.perf_counter()
        long_f.result(timeout=600)
        short_p50 = float(np.percentile(short_lat, 50) * 1000)
        log(f"mixed: short p50 {short_p50:.0f}ms; long still running while "
            f"shorts completed: {long_running_at_shorts_done}")
    finally:
        cb.stop()

    print(json.dumps({
        "metric": "llm_continuous_tokens_per_s",
        "value": round(cont_tps, 1),
        "unit": "tok/s",
        "vs_baseline": None,
        "extra": {
            "model": model,
            "wave_tokens_per_s": round(wave_tps, 1),
            "mixed_short_request_p50_ms": round(short_p50, 1),
            "long_not_blocking_shorts": bool(long_running_at_shorts_done),
            "n_slots": 8, "segment_tokens": 16,
            "idle_segment_tokens": idle_seg,
            "segments_run": cb.segments_run,
            "speculative_k": spec_k,
            "note": "random-init weights; single v5e via relay "
                    "(~28ms/dispatch floor; continuous pays it per "
                    "16-token segment, wave once per batch)",
        },
    }))


if __name__ == "__main__":
    main()
