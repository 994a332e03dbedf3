"""Diarization DER evaluation: trained speaker asset vs random-init
encoder, both engines, over synthetic 2-4-speaker conversations.

Produces the DER-of-record table for docs/PERFORMANCE.md ("Diarization
quality"). Held-out voices (seeds disjoint from training), ground truth
from the conversation generator. The reference never shipped a DER
self-check; its quality claim rides titanet_large + pyannote.metrics
externally.

Run: python scripts/eval_der.py   (CPU, ~2 min, deterministic)
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def main() -> int:
    import jax

    jax.config.update("jax_platforms", "cpu")

    from audio_rag_tpu.audio.synth import conversation, sample_voice
    from audio_rag_tpu.config.schema import DiarizationConfig
    from audio_rag_tpu.core.types import TranscriptSegment
    from audio_rag_tpu.diarization.ahc import AHCDiarizer
    from audio_rag_tpu.diarization.clustering import ClusteringDiarizer
    from audio_rag_tpu.diarization.metrics import diarization_error_rate

    scenarios = []
    rng = np.random.default_rng(4242)
    for n_spk in (2, 3, 4):
        for rep in range(3):
            voices = [sample_voice(rng) for _ in range(n_spk)]
            audio, turns = conversation(rng, voices, duration_s=60.0)
            ref = [TranscriptSegment(text="", start=s, end=e,
                                     speaker=f"REF_{k}")
                   for s, e, k in turns]
            scenarios.append((n_spk, rep, audio, ref))

    engines = {"clustering": ClusteringDiarizer, "ahc": AHCDiarizer}
    results: dict[str, dict] = {}
    for engine, cls in engines.items():
        for encoder in ("trained", "random"):
            cfg = DiarizationConfig(
                backend=engine, vad_backend="energy",
                model="test" if encoder == "random" else "titanet-jax",
            )
            d = cls(cfg)
            d.load()
            ders, known_k_ders = [], []
            t0 = time.time()
            try:
                for n_spk, _rep, audio, ref in scenarios:
                    hyp = d.diarize(audio, 16_000)
                    ders.append(diarization_error_rate(ref, hyp).der)
                    hyp_k = d.diarize(audio, 16_000, num_speakers=n_spk)
                    known_k_ders.append(
                        diarization_error_rate(ref, hyp_k).der)
            finally:
                d.unload()
            results[f"{engine}/{encoder}"] = {
                "der_mean": round(float(np.mean(ders)), 4),
                "der_known_k_mean": round(float(np.mean(known_k_ders)), 4),
                "der_per_scenario": ders,
                "wall_s": round(time.time() - t0, 1),
            }
            print(f"{engine:10s} {encoder:7s}: "
                  f"DER {np.mean(ders):.3f} "
                  f"(known-k {np.mean(known_k_ders):.3f})")

    out = REPO / "docs" / "bench_runs" / "diarization_der.json"
    out.write_text(json.dumps(
        {"scenarios": "2-4 spk x3, 60s each, held-out voices",
         "collar_s": 0.25, "results": results}, indent=2))
    print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
