"""Analytic FLOP estimators for the bench's device-time / MFU breakdown.

The relay this environment reaches the TPU through hides true device time
(block_until_ready does not fully block across it), so the bench separates
cost as: measured wall time − measured dispatch floor ≈ device time, and
MFU = analytic FLOPs / device time / peak. Estimates use the standard
2·params·tokens forward rule over MATMUL parameters (embedding tables are
gathers, not FLOPs) plus attention's 2·2·T²·d term where it matters.
"""

from __future__ import annotations

from typing import Any

import numpy as np

__all__ = ["matmul_param_count", "forward_gflops", "attention_gflops",
           "mfu_pct", "V5E_BF16_TFLOPS"]

#: single v5e chip peak (bf16)
V5E_BF16_TFLOPS = 197.0


def matmul_param_count(params: Any, skip_substrings: tuple[str, ...] = (
        "tok_emb", "pos_emb")) -> int:
    """Total parameter count excluding embedding tables (gather-only)."""
    import jax

    total = 0
    for kp, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        path = "/".join(str(getattr(k, "key", k)) for k in kp)
        if any(s in path for s in skip_substrings):
            continue
        if hasattr(leaf, "size"):
            total += int(leaf.size)
    return total


def forward_gflops(n_matmul_params: int, n_tokens: int) -> float:
    """2·params·tokens rule for a transformer forward pass, in GFLOP."""
    return 2.0 * n_matmul_params * n_tokens / 1e9


def attention_gflops(n_layers: int, d_model: int, n_tokens_q: int,
                     n_tokens_kv: int, batch: int = 1) -> float:
    """QK^T + PV: 2 · 2 · Tq · Tkv · d per layer, in GFLOP."""
    return 4.0 * n_layers * d_model * n_tokens_q * n_tokens_kv * batch / 1e9


def mfu_pct(gflops: float, device_ms: float,
            peak_tflops: float = V5E_BF16_TFLOPS) -> float:
    """Model FLOP utilization (%) given estimated device milliseconds."""
    if device_ms <= 0:
        return 0.0
    return float(np.clip(
        100.0 * (gflops / 1e3) / (device_ms / 1e3 * peak_tflops), 0, 100))
