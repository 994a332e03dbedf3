"""Run the discriminating quality sweep and print the metric table.

Measures dense / sparse / hybrid / hybrid+rerank / hybrid+context /
hybrid+context+prf through the production fused QueryEngine over the
extended synthetic corpus (272 chunks, 40 queries) with the committed
trained tiny models (see ``scripts/train_retrieval.py``). The table in
docs/FIDELITY.md is produced by this script; the orderings it demonstrates
(hybrid > dense overall, rerank > no-rerank on pair queries, contextual >
plain on context queries, PRF > raw on mismatch queries) are pinned by
``tests/unit/evaluation/test_quality_separation.py``.

Reference comparison: the reference's published sweep separates the same
way for the same reasons (P@5 0.425 dense → 0.625 contextual+hybrid →
0.675 +HyDE, reference README.md:30-31) — this corpus makes each stage's
mechanism independently measurable in a zero-egress build.

Run on CPU for determinism: ``python scripts/eval_quality.py``
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> int:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--audio", action="store_true",
                    help="audio-in ladder: speak the corpus in the "
                         "charvoice and transcribe with the committed "
                         "trained tiny ASR before embedding (writes "
                         "docs/bench_runs/quality_audio_in.json)")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    from audio_rag_tpu.evaluation.quality import (
        build_eval_setup_audio,
        run_quality_sweep,
    )

    if args.audio:
        import time

        t0 = time.time()
        engines, corpus = build_eval_setup_audio()
        print(f"spoke + transcribed {len(corpus.chunks)} chunks in "
              f"{time.time() - t0:.0f}s", file=sys.stderr)
        sweep = run_quality_sweep(engines, corpus.eval_set)
    else:
        sweep = run_quality_sweep()
    hdr = f"{'config':>16} | {'P@5':>6} | {'MRR':>6} | {'NDCG':>6} | " \
          f"{'hit':>5} | per-type P@5 (para / tag / pair / ctx / mism)"
    print(hdr)
    print("-" * len(hdr))
    for cfg, m in sweep.items():
        bt = m["by_type"]
        per = " / ".join(
            f"{bt.get(t, {}).get('p_at_5', 0.0):.3f}"
            for t in ("paraphrase", "tag", "pair", "context", "mismatch")
        )
        print(f"{cfg:>16} | {m['p_at_5']:6.3f} | {m['mrr']:6.3f} | "
              f"{m['ndcg']:6.3f} | {m['hit_rate']:5.3f} | {per}")
    print()
    print(json.dumps(sweep))
    if args.audio:
        out = Path(__file__).resolve().parents[1] / "docs" / "bench_runs" \
            / "quality_audio_in.json"
        out.write_text(json.dumps(
            {"metric": "quality_ladder_audio_in", "sweep": sweep}) + "\n")
        print(f"wrote {out}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
