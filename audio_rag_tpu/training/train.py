"""Whisper fine-tuning on the device mesh (dp × tp).

The reference has no training capability at all (SURVEY.md §2.4: inference
only); this module adds domain-adaptation fine-tuning as a first-class
TPU-native feature: teacher-forced cross-entropy over (mel, token) pairs,
AdamW via optax, parameters tensor-parallel over the ``model`` mesh axis
(Megatron column/row layout) and the batch sharded over ``data``. XLA emits
the psum/all-gathers from the NamedSharding annotations — no hand-written
collectives.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from audio_rag_tpu.models.whisper import (
    WhisperDims,
    decoder_forward,
    encode,
    precompute_cross_kv,
    whisper_param_spec,
)

__all__ = ["TrainConfig", "whisper_param_spec", "make_train_step",
           "init_train_state"]


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    learning_rate: float = 1e-5
    weight_decay: float = 0.01
    warmup_steps: int = 100
    grad_clip: float = 1.0
    dtype: Any = jnp.float32


def loss_fn(
    params: dict,
    dims: WhisperDims,
    mel: jax.Array,  # (B, n_mels, T)
    tokens: jax.Array,  # (B, S) teacher-forced input
    targets: jax.Array,  # (B, S) next-token labels
    mask: jax.Array,  # (B, S) 1 where the label counts
    dtype=jnp.float32,
) -> jax.Array:
    enc = encode(params, dims, mel, dtype=dtype)
    ckv = precompute_cross_kv(params, dims, enc, dtype=dtype)
    logits, _, _ = decoder_forward(params, dims, tokens, ckv, dtype=dtype)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    return jnp.sum(nll * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    schedule = optax.warmup_cosine_decay_schedule(
        0.0, cfg.learning_rate, cfg.warmup_steps, 10_000
    )
    return optax.chain(
        optax.clip_by_global_norm(cfg.grad_clip),
        optax.adamw(schedule, weight_decay=cfg.weight_decay),
    )


def init_train_state(
    params: dict, cfg: TrainConfig, mesh: Mesh, dims: WhisperDims
):
    """Place params per the TP spec and opt state congruently."""
    spec = whisper_param_spec(dims)
    placed = jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, spec
    )
    opt = make_optimizer(cfg)
    opt_state = opt.init(placed)
    return placed, opt, opt_state, spec


def make_train_step(dims: WhisperDims, cfg: TrainConfig, mesh: Mesh, opt):
    """Compiled train step: (params, opt_state, batch) → (params, opt_state,
    loss). Batch arrives sharded over the ``data`` axis."""

    def step(params, opt_state, mel, tokens, targets, mask):
        loss, grads = jax.value_and_grad(loss_fn)(
            params, dims, mel, tokens, targets, mask, cfg.dtype
        )
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    data_sharding = NamedSharding(mesh, P("data"))

    jitted = jax.jit(step, donate_argnums=(0, 1))

    def run(params, opt_state, batch):
        mel, tokens, targets, mask = (
            jax.device_put(batch["mel"], data_sharding),
            jax.device_put(batch["tokens"], data_sharding),
            jax.device_put(batch["targets"], data_sharding),
            jax.device_put(batch["mask"], data_sharding),
        )
        return jitted(params, opt_state, mel, tokens, targets, mask)

    return run
