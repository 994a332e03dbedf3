"""Pin the committed quantization-numerics evidence at PRODUCTION dims.

Round-3 VERDICT Weak #5: the int8/int4 kernels were exact-parity-tested
at tiny dims only while ``configs/production.yaml`` ships int8 on.
``scripts/eval_quant_numerics.py`` (one-off real-chip run, compile-
cached) measured per-kernel logit divergence and full greedy-decode
agreement at whisper large-v3 shapes; this test asserts the committed
artifact stays present, well-formed, and inside the bounds the config
schema docstrings cite — if the kernels regress and the script is
re-run, these bounds fail loudly instead of the artifact silently
drifting.

Measured 2026-08-20 (docs/bench_runs/quant_numerics.json):

* single-step max logit divergence vs bf16, relative to the logit
  range: cross_kv_int8 0.71 %, cross_kv_int4 0.74 %, decoder_int8
  1.3 %, decoder_int4 11.9 % (the int4 weight error is inherently
  ~16× int8's per-weight error — group-amax grid; schema docstring).
* full 64-step greedy windows (B=8): int8 profile 99.6 % token match,
  mean |Δ avg_logprob| 0.0066; int8+kv4 (the beam/wb capacity profile)
  99.8 % / 0.0048; all-int4 99.2 % / 0.159.

Random-init weights bound KERNEL numerics (quantization error depends
on shapes/scale granularity/accumulation order, not what weights
mean); WER on real checkpoints stays a weight-available question.
"""

from __future__ import annotations

import json
from pathlib import Path

import pytest

ARTIFACT = (Path(__file__).resolve().parents[3]
            / "docs" / "bench_runs" / "quant_numerics.json")

# (kernel, max allowed single-step divergence / logit range)
SINGLE_STEP_BOUNDS = {
    "cross_kv_int8": 0.02,
    "cross_kv_int4": 0.02,
    "decoder_int8": 0.03,
    "decoder_int4": 0.20,  # int4 weight grid: ~16x int8's error
}
# (profile, min token match, max mean |delta avg_logprob|)
PROFILE_BOUNDS = {
    "int8_profile": (0.98, 0.05),
    "int8_w_kv4": (0.98, 0.05),
    "int4_profile": (0.95, 0.40),
}


@pytest.fixture(scope="module")
def evidence():
    assert ARTIFACT.exists(), (
        "production-dims quant evidence missing — run "
        "scripts/eval_quant_numerics.py on the chip")
    return json.loads(ARTIFACT.read_text())


def test_artifact_shapes_are_production(evidence):
    assert "large-v3" in evidence["shapes"]
    assert "d=1280" in evidence["shapes"]


def test_single_step_divergence_within_bounds(evidence):
    got = evidence["single_step_vs_bf16"]
    assert set(got) == set(SINGLE_STEP_BOUNDS)
    for kernel, bound in SINGLE_STEP_BOUNDS.items():
        rel = got[kernel]["max_rel_to_range"]
        assert 0.0 < rel < bound, (kernel, rel)
        # argmax agreement on random near-tie logits: conservative floor
        assert got[kernel]["top1_agreement"] >= 0.75, kernel


def test_int4_weight_error_dominates_int8(evidence):
    """The schema docstrings claim int4 decoder-weight error ≫ int8's
    while the cross-KV kernels stay comparable — pin that ordering."""
    got = evidence["single_step_vs_bf16"]
    assert (got["decoder_int4"]["max_rel_to_range"]
            > 4 * got["decoder_int8"]["max_rel_to_range"])
    assert (got["cross_kv_int4"]["max_rel_to_range"]
            < 2 * got["cross_kv_int8"]["max_rel_to_range"])


def test_greedy_profiles_within_bounds(evidence):
    got = evidence["greedy_profiles_vs_bf16"]
    assert set(got) == set(PROFILE_BOUNDS)
    for profile, (min_match, max_lp) in PROFILE_BOUNDS.items():
        assert got[profile]["token_match_rate"] >= min_match, profile
        assert got[profile]["avg_logprob_delta_mean"] <= max_lp, profile


def test_production_profile_is_the_tight_one(evidence):
    """production.yaml ships int8 — its decode agreement must not be
    looser than the int4 footprint option's."""
    got = evidence["greedy_profiles_vs_bf16"]
    assert (got["int8_profile"]["avg_logprob_delta_mean"]
            <= got["int4_profile"]["avg_logprob_delta_mean"])
