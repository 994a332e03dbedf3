"""Speaker-embedding extractor + frame VAD (functional JAX).

TPU-native replacement for the NeMo stack the reference drives in
``diarization/nemo.py:45-100`` (marblenet VAD + titanet_large embeddings over
1.5 s windows with 0.75 s shift). A TDNN/ECAPA-flavored conv encoder over
log-mel frames with attentive statistics pooling produces fixed-length
speaker embeddings; a small dilated-conv net scores per-frame speech
probability. Both run batched over all windows of a file at once — the
GPU reference processes windows in NeMo's internal loop.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from audio_rag_tpu.models.layers import (
    Params,
    layer_norm,
    layer_norm_init,
    linear,
    linear_init,
)

__all__ = [
    "SpeakerDims",
    "SPEAKER_PRESETS",
    "init_speaker_encoder",
    "speaker_embed",
    "speaker_dims_from_params",
    "load_speaker_asset",
    "resolve_speaker_params",
    "init_vad",
    "vad_scores",
]


@dataclasses.dataclass(frozen=True)
class SpeakerDims:
    n_mels: int = 80
    channels: int = 512
    n_blocks: int = 3
    emb_dim: int = 192
    kernel: int = 5


SPEAKER_PRESETS: dict[str, SpeakerDims] = {
    "titanet-jax": SpeakerDims(80, 512, 3, 192, 5),
    #: the committed trained asset's shape (scripts/train_speaker.py)
    "small": SpeakerDims(80, 128, 3, 128, 5),
    "test": SpeakerDims(80, 32, 2, 16, 3),
}


def _conv_init(key: jax.Array, k: int, c_in: int, c_out: int) -> Params:
    scale = (k * c_in) ** -0.5
    return {
        "w": jax.random.normal(key, (k, c_in, c_out), jnp.float32) * scale,
        "b": jnp.zeros((c_out,), jnp.float32),
    }


def _conv1d(p: Params, x: jax.Array, dilation: int = 1,
            dtype: jnp.dtype = jnp.bfloat16) -> jax.Array:
    """x (B, T, C) → (B, T, C_out), SAME padding."""
    y = jax.lax.conv_general_dilated(
        x.astype(dtype), p["w"].astype(dtype),
        window_strides=(1,), padding="SAME",
        rhs_dilation=(dilation,),
        dimension_numbers=("NWC", "WIO", "NWC"),
        preferred_element_type=jnp.float32,
    )
    return (y + p["b"]).astype(dtype)


def init_speaker_encoder(key: jax.Array, dims: SpeakerDims) -> Params:
    keys = jax.random.split(key, dims.n_blocks + 4)
    blocks = []
    c_in = dims.n_mels
    for i in range(dims.n_blocks):
        blocks.append(
            {
                "conv": _conv_init(keys[i], dims.kernel, c_in, dims.channels),
                "ln": layer_norm_init(dims.channels),
            }
        )
        c_in = dims.channels
    return {
        "blocks": blocks,  # heterogeneous c_in → keep as list (small depth)
        "attn": linear_init(keys[-4], dims.channels, 1),
        "proj": linear_init(keys[-3], dims.channels * 2, dims.emb_dim),
    }


def speaker_embed(
    params: Params,
    dims: SpeakerDims,
    mel: jax.Array,  # (B, n_mels, T) log-mel windows
    dtype: jnp.dtype = jnp.bfloat16,
) -> jax.Array:
    """Windows → L2-normalized speaker embeddings (B, emb_dim) fp32."""
    x = mel.transpose(0, 2, 1)  # (B, T, n_mels)
    for i, blk in enumerate(params["blocks"]):
        h = _conv1d(blk["conv"], x, dilation=2 ** i, dtype=dtype)
        h = jax.nn.relu(layer_norm(blk["ln"], h))
        x = h if x.shape[-1] != h.shape[-1] else x + h  # residual when shapes match
    # attentive statistics pooling
    a = jax.nn.softmax(
        linear(params["attn"], x, dtype).astype(jnp.float32), axis=1
    )  # (B, T, 1)
    xf = x.astype(jnp.float32)
    mu = jnp.sum(a * xf, axis=1)
    var = jnp.sum(a * (xf - mu[:, None, :]) ** 2, axis=1)
    stats = jnp.concatenate([mu, jnp.sqrt(var + 1e-6)], axis=-1)
    emb = linear(params["proj"], stats.astype(dtype), dtype).astype(jnp.float32)
    return emb / jnp.maximum(jnp.linalg.norm(emb, axis=-1, keepdims=True), 1e-9)


# -- trained-asset resolution ---------------------------------------------


def speaker_dims_from_params(params: Params) -> SpeakerDims:
    """Infer :class:`SpeakerDims` from a param tree's shapes (works for
    both the small TDNN and converted ECAPA trees)."""
    from audio_rag_tpu.models.ecapa import ecapa_emb_dim, is_ecapa_params

    if is_ecapa_params(params):
        k, n_mels, channels = params["frontend"]["conv"]["w"].shape
        return SpeakerDims(int(n_mels), int(channels),
                           len(params["layers"]), ecapa_emb_dim(params),
                           int(k))
    blocks = params["blocks"]
    k, n_mels, channels = blocks[0]["conv"]["w"].shape
    emb_dim = params["proj"]["w"].shape[1]
    return SpeakerDims(int(n_mels), int(channels), len(blocks),
                       int(emb_dim), int(k))


def load_speaker_asset() -> tuple[SpeakerDims, Params] | None:
    """The committed trained speaker encoder
    (``assets/speaker_small.npz``, produced by
    ``scripts/train_speaker.py``), or ``None`` when absent. The npz
    stores the blocks list under string indices; rebuild the list."""
    import pathlib

    from audio_rag_tpu.checkpoint import load_npz_asset

    path = (pathlib.Path(__file__).resolve().parents[1] / "assets"
            / "speaker_small.npz")
    tree = load_npz_asset(path)
    if tree is None:
        return None
    blocks = tree["blocks"]
    if isinstance(blocks, dict):
        tree = dict(tree)
        tree["blocks"] = [blocks[k] for k in
                          sorted(blocks, key=lambda s: int(s))]
    return speaker_dims_from_params(tree), tree


def resolve_speaker_params(
    checkpoint_path: str | None, dims: SpeakerDims,
    allow_asset: bool = True,
) -> tuple[SpeakerDims, Params, str]:
    """Speaker-encoder weights by precedence: explicit converted
    checkpoint (``convert_speaker``) → committed trained asset → random
    init (with a loud warning — clustering on random embeddings is only
    good for plumbing tests). Returns ``(dims, params, source)``; dims
    follow the loaded weights, not the config preset, so the caller must
    adopt them. ``allow_asset=False`` (the ``model="test"`` preset)
    skips the asset so plumbing tests keep their tiny random encoder.
    """
    from audio_rag_tpu.utils.logging import get_logger

    logger = get_logger(__name__)
    if checkpoint_path:
        from audio_rag_tpu.checkpoint import restore_params

        params = restore_params(checkpoint_path, "speaker")
        if params is not None:
            return speaker_dims_from_params(params), params, "checkpoint"
        logger.warning("speaker checkpoint missing at %s; falling back",
                       checkpoint_path)
    if allow_asset:
        asset = load_speaker_asset()
        if asset is not None:
            return asset[0], asset[1], "asset"
        logger.warning(
            "no trained speaker encoder available - diarization will "
            "cluster RANDOM-INIT embeddings (labels will be meaningless)")
    return dims, init_speaker_encoder(jax.random.PRNGKey(0), dims), "random"


# -- VAD -------------------------------------------------------------------

def init_vad(key: jax.Array, n_mels: int = 80, channels: int = 64) -> Params:
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "c1": _conv_init(k1, 5, n_mels, channels),
        "ln1": layer_norm_init(channels),
        "c2": _conv_init(k2, 5, channels, channels),
        "ln2": layer_norm_init(channels),
        "out": linear_init(k3, channels, 1),
    }


def vad_scores(
    params: Params, mel: jax.Array, dtype: jnp.dtype = jnp.bfloat16
) -> jax.Array:
    """mel (B, n_mels, T) → per-frame speech probability (B, T) fp32."""
    x = mel.transpose(0, 2, 1)
    x = jax.nn.relu(layer_norm(params["ln1"], _conv1d(params["c1"], x, 1, dtype)))
    x = jax.nn.relu(layer_norm(params["ln2"], _conv1d(params["c2"], x, 2, dtype)))
    return jax.nn.sigmoid(
        linear(params["out"], x, dtype)[..., 0].astype(jnp.float32)
    )
