"""Whisper encoder/decoder in functional JAX — the TPU replacement for the
CTranslate2 engine behind faster-whisper (reference ``asr/whisper.py:55-62``).

Architecture (OpenAI Whisper, public):
* encoder: two 1-D convs (stride 1, 2) + GELU → sinusoidal positions →
  pre-LN transformer blocks → final LN. Input mel (B, n_mels, 3000).
* decoder: token + learned positional embeddings → pre-LN blocks with causal
  self-attention (KV-cached) and cross-attention over encoder output →
  logits tied to the token embedding.

TPU-first choices:
* **scan over layers**: per-layer params are stacked so the 32-layer
  large-v3 stack compiles as one ``lax.scan`` body (compile time ~constant
  in depth).
* **static-shape KV cache** (B, H, n_text_ctx, D) per layer, stacked across
  layers, updated with ``dynamic_update_slice`` inside a ``lax.while_loop``
  greedy decode — no Python control flow on device values.
* **window batching**: the 30 s windows of a long file decode as one batch
  (reference decodes windows sequentially inside CTranslate2).
* cross-attention K/V are precomputed once per window before the decode loop.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from audio_rag_tpu.models.layers import (
    Params,
    embedding_init,
    layer_norm,
    layer_norm_init,
    linear,
    linear_init,
    linear_q8,
    make_causal_mask,
    mha,
    mha_init,
    mlp,
    mlp_init,
    quantize_linear,
    quantize_linear_q4,
    sinusoid_positions,
)

__all__ = [
    "WhisperDims",
    "WHISPER_PRESETS",
    "SpecialTokens",
    "init_whisper",
    "whisper_param_spec",
    "encode",
    "decoder_forward",
    "precompute_cross_kv",
    "greedy_decode",
    "beam_decode",
    "detect_language",
]


@dataclasses.dataclass(frozen=True)
class WhisperDims:
    n_mels: int
    n_audio_ctx: int
    n_audio_state: int
    n_audio_head: int
    n_audio_layer: int
    n_vocab: int
    n_text_ctx: int
    n_text_state: int
    n_text_head: int
    n_text_layer: int


WHISPER_PRESETS: dict[str, WhisperDims] = {
    "tiny": WhisperDims(80, 1500, 384, 6, 4, 51865, 448, 384, 6, 4),
    "base": WhisperDims(80, 1500, 512, 8, 6, 51865, 448, 512, 8, 6),
    "small": WhisperDims(80, 1500, 768, 12, 12, 51865, 448, 768, 12, 12),
    "medium": WhisperDims(80, 1500, 1024, 16, 24, 51865, 448, 1024, 16, 24),
    "large-v2": WhisperDims(80, 1500, 1280, 20, 32, 51865, 448, 1280, 20, 32),
    "large-v3": WhisperDims(128, 1500, 1280, 20, 32, 51866, 448, 1280, 20, 32),
    # tiny shapes for tests/CI
    "test": WhisperDims(80, 60, 64, 2, 2, 1024, 32, 64, 2, 2),
    # tiny shapes with the REAL multilingual v2 vocab (51865): exercises
    # language detection / per-row language tokens on the CPU mesh
    "test-ml": WhisperDims(80, 60, 64, 2, 2, 51865, 32, 64, 2, 2),
    # the committed TRAINED tiny ASR (scripts/train_asr.py): 6 s windows
    # (n_audio_ctx 300), char-level vocab = models/tts.py SYMBOLS (47)
    # + spare + 9 specials at the top (SpecialTokens.for_dims test path).
    # 128 mels (like large-v3): the charvoice's consonant bands sit
    # ~140 Hz apart around 2-3 kHz, right at 80-mel bin width — the
    # finer filterbank separably resolves them (measured: word WER
    # 0.24 → ~0.05). Closes the speech→text loop on the synthetic
    # charvoice the trained TTS asset speaks — the reference's
    # downloaded Whisper weights (asr/whisper.py:55-62) have no
    # zero-egress equivalent at full vocab.
    "tiny-synth": WhisperDims(128, 300, 128, 4, 3, 64, 128, 128, 4, 3),
}

#: char-level text codec for the "tiny-synth" preset: token id == index
#: into the TTS symbol table, so TTS and ASR agree on the charset.
from audio_rag_tpu.models.tts import SYMBOLS as CHAR_SYMBOLS  # noqa: E402


def char_encode(text: str) -> list[int]:
    """Lowercased text → tiny-synth token ids (unknown chars → space)."""
    space = CHAR_SYMBOLS.index(" ")
    return [
        CHAR_SYMBOLS.index(c) if c in CHAR_SYMBOLS and c != "_" else space
        for c in text.lower()
    ]


def char_decode(ids) -> str:
    """tiny-synth token ids → text (pad/unknown ids drop)."""
    return "".join(
        CHAR_SYMBOLS[int(i)]
        for i in ids
        if 0 < int(i) < len(CHAR_SYMBOLS)
    )


@dataclasses.dataclass(frozen=True)
class SpecialTokens:
    """Multilingual Whisper special-token ids (v2 vocab; large-v3 +1 past sot)."""

    eot: int = 50257
    sot: int = 50258
    lang_base: int = 50259  # <|en|> = lang_base
    translate: int = 50358
    transcribe: int = 50359
    sot_prev: int = 50361  # <|startofprev|>: conditioning-prompt prefix
    no_speech: int = 50362
    no_timestamps: int = 50363
    timestamp_base: int = 50364

    @classmethod
    def for_dims(cls, dims: WhisperDims) -> "SpecialTokens":
        if dims.n_vocab == 51866:  # large-v3 adds <|yue|>, shifting post-lang ids
            return cls(
                eot=50257, sot=50258, lang_base=50259, translate=50359,
                transcribe=50360, sot_prev=50362, no_speech=50363,
                no_timestamps=50364, timestamp_base=50365,
            )
        if dims.n_vocab < 51865:  # test vocab: specials at the top, like real
            # 9 reserved slots at v-9..v-1 in the real vocab's relative
            # order, so sot_prev sits INSIDE the control range and
            # _strip_special's "eot <= i < timestamp_base is control"
            # assumption covers it (a sot_prev below eot would collide
            # with a regular text token id).
            v = dims.n_vocab
            return cls(
                eot=v - 9, sot=v - 8, lang_base=v - 7, translate=v - 6,
                transcribe=v - 5, sot_prev=v - 4, no_speech=v - 3,
                no_timestamps=v - 2, timestamp_base=v - 1,
            )
        return cls()


def _stack_layers(layer_params: list[Params]) -> Params:
    """Stack a list of per-layer param trees into arrays with leading L dim."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *layer_params)


# -- init ------------------------------------------------------------------

def _block_init(key: jax.Array, d: int, cross: bool) -> Params:
    ks = jax.random.split(key, 3 if cross else 2)
    p: Params = {
        "ln1": layer_norm_init(d),
        "attn": mha_init(ks[0], d, 1, bias=True, kv_bias=False),  # heads at apply
        "mlp": mlp_init(ks[1], d, d * 4),
        "ln_mlp": layer_norm_init(d),
    }
    if cross:
        p["cross"] = mha_init(ks[2], d, 1, bias=True, kv_bias=False)
        p["ln_cross"] = layer_norm_init(d)
    return p


def init_whisper(
    key: jax.Array,
    dims: WhisperDims,
    storage_dtype: jnp.dtype | None = None,
) -> Params:
    """Random-init parameter tree (checkpoint loading overwrites in place).

    storage_dtype: when set (e.g. ``jnp.bfloat16``) the per-layer blocks are
    generated inside a ``lax.scan`` with an immediate cast, so fp32 exists
    one layer at a time instead of all-layers-plus-stack-transient (~2x the
    fp32 param bytes — the pattern that OOMs a 16 GB chip when co-resident
    with other models). Matches casting the default path's output to within
    1 bf16 ULP (XLA may fuse scale multiplies into the cast).
    """
    k_enc, k_dec, k_c1, k_c2, k_emb = jax.random.split(key, 5)
    d_a, d_t = dims.n_audio_state, dims.n_text_state

    if storage_dtype is None:
        cast = lambda t: t  # noqa: E731

        def stack_blocks(keys: jax.Array, d: int, cross: bool) -> Params:
            return _stack_layers([_block_init(k, d, cross) for k in keys])
    else:
        # mirror engine.bf16_storage: cast fp32 leaves only
        cast = lambda t: jax.tree.map(  # noqa: E731
            lambda x: x.astype(storage_dtype)
            if x.dtype == jnp.float32 else x, t,
        )

        def stack_blocks(keys: jax.Array, d: int, cross: bool) -> Params:
            return jax.lax.scan(
                lambda _, k: (None, cast(_block_init(k, d, cross))),
                None, keys,
            )[1]

    scale = d_a ** -0.5
    return {
        "encoder": {
            "conv1": cast({
                "w": jax.random.normal(k_c1, (3, dims.n_mels, d_a)) * scale,
                "b": jnp.zeros((d_a,)),
            }),
            "conv2": cast({
                "w": jax.random.normal(k_c2, (3, d_a, d_a)) * scale,
                "b": jnp.zeros((d_a,)),
            }),
            "pos": cast(jnp.asarray(sinusoid_positions(dims.n_audio_ctx, d_a))),
            "blocks": stack_blocks(
                jax.random.split(k_enc, dims.n_audio_layer), d_a, cross=False
            ),
            "ln_post": cast(layer_norm_init(d_a)),
        },
        "decoder": {
            "tok_emb": cast(embedding_init(k_emb, dims.n_vocab, d_t)),
            "pos_emb": cast(jax.random.normal(
                jax.random.fold_in(k_emb, 1), (dims.n_text_ctx, d_t)
            ) * 0.01),
            "blocks": stack_blocks(
                jax.random.split(k_dec, dims.n_text_layer), d_t, cross=True
            ),
            "ln": cast(layer_norm_init(d_t)),
        },
    }


def _tp_block_spec(cross: bool) -> dict:
    """Per-layer tensor-parallel specs, leading stacked-layer dim replicated.

    Column-parallel (split output features): q/k/v, mlp.up — weights
    (L, d_in, d_out) → P(None, None, 'model'), biases (L, d_out) →
    P(None, 'model'). Row-parallel (split input features): o, mlp.down —
    weights → P(None, 'model', None), biases replicated. The Megatron
    layout: heads/FFN-hidden are split, each block needs one psum, which
    XLA emits from the NamedSharding annotations.
    """
    col_w, col_b = P(None, None, "model"), P(None, "model")
    row_w, rep_b = P(None, "model", None), P(None, None)
    ln = {"g": P(None, None), "b": P(None, None)}
    spec = {
        "ln1": ln,
        "attn": {
            "q": {"w": col_w, "b": col_b},
            "k": {"w": col_w},
            "v": {"w": col_w, "b": col_b},
            "o": {"w": row_w, "b": rep_b},
        },
        "mlp": {
            "up": {"w": col_w, "b": col_b},
            "down": {"w": row_w, "b": rep_b},
        },
        "ln_mlp": ln,
    }
    if cross:
        spec["cross"] = {
            "q": {"w": col_w, "b": col_b},
            "k": {"w": col_w},
            "v": {"w": col_w, "b": col_b},
            "o": {"w": row_w, "b": rep_b},
        }
        spec["ln_cross"] = ln
    return spec


def whisper_param_spec(dims: WhisperDims) -> dict:
    """PartitionSpec tree mirroring ``init_whisper``'s param tree.

    Used for BOTH fine-tuning (``training/train.py``) and inference
    serving (``asr/whisper_jax.py``): with the mesh's ``model`` axis > 1
    the decode loop's per-token weight read — the memory-bound term that
    caps single-chip ASR at ~8% MFU (docs/PERFORMANCE.md) — splits across
    chips, and the per-chip HBM freed by sharded params raises the window
    batch cap. GSPMD propagates the head split into the self/cross KV
    caches from the q/k/v projections; no hand-written collectives
    (reference scale-out is whole-jobs-per-GPU-worker only, SURVEY §2.4).
    """
    rep2 = P(None, None)
    return {
        "encoder": {
            # convs are <0.5% of params — replicate, shard the blocks
            "conv1": {"w": P(None, None, None), "b": P(None)},
            "conv2": {"w": P(None, None, None), "b": P(None)},
            "pos": rep2,
            "blocks": _tp_block_spec(cross=False),
            "ln_post": {"g": P(None), "b": P(None)},
        },
        "decoder": {
            "tok_emb": {"table": rep2},
            "pos_emb": rep2,
            "blocks": _tp_block_spec(cross=True),
            "ln": {"g": P(None), "b": P(None)},
        },
    }


# -- encoder ---------------------------------------------------------------

def _conv1d(p: Params, x: jax.Array, stride: int,
            dtype: jnp.dtype) -> jax.Array:
    """x: (B, T, C_in) → (B, T/stride, C_out), SAME padding, kernel 3."""
    y = jax.lax.conv_general_dilated(
        x.astype(dtype),
        p["w"].astype(dtype),
        window_strides=(stride,),
        padding="SAME",
        dimension_numbers=("NWC", "WIO", "NWC"),
        preferred_element_type=jnp.float32,
    )
    return (y + p["b"]).astype(dtype)


def encode(
    params: Params, dims: WhisperDims, mel: jax.Array,
    dtype: jnp.dtype = jnp.bfloat16,
) -> jax.Array:
    """mel (B, n_mels, 2*n_audio_ctx) → encoder states (B, n_audio_ctx, d)."""
    enc = params["encoder"]
    x = mel.transpose(0, 2, 1)  # (B, T, n_mels)
    x = jax.nn.gelu(_conv1d(enc["conv1"], x, 1, dtype), approximate=False)
    x = jax.nn.gelu(_conv1d(enc["conv2"], x, 2, dtype), approximate=False)
    x = x + enc["pos"].astype(dtype)

    n_heads = dims.n_audio_head

    def block(x, p):
        h, _ = mha(p["attn"], layer_norm(p["ln1"], x), n_heads, dtype=dtype)
        x = x + h
        x = x + mlp(p["mlp"], layer_norm(p["ln_mlp"], x), dtype)
        return x, None

    x, _ = jax.lax.scan(block, x, enc["blocks"])
    return layer_norm(enc["ln_post"], x)


# -- decoder ---------------------------------------------------------------

def precompute_cross_kv(
    params: Params, dims: WhisperDims, enc: jax.Array,
    dtype: jnp.dtype = jnp.bfloat16, quantize: bool = False,
    bits: int = 8,
):
    """Per-layer cross K/V from encoder states: (L, B, H, Ta, D) each.

    ``quantize=True`` returns (k_q, v_q, k_scale, v_scale):

    * ``bits=8``: int8 tensors TRANSPOSED to (L, B, H, D, Ta) with
      per-(L, B, H) fp32 scales.
    * ``bits=4``: int4 nibble-packed (L, B, H, D/2, Ta) — byte row ``r``
      holds head-dim ``r`` (low nibble) and ``r + D/2`` (high) — with
      per-(L, B, H, 1, D) CHANNEL scales (amax over time): 4-bit needs
      finer granularity than per-head, and the channel axis is the one
      whose scales fold into q / the output for free (the time axis
      would need in-kernel scale operands).

    The decode loop re-reads the ENTIRE cross KV every generated token —
    the dominant per-step HBM term (with int8 weights it is ~2/3 of the
    step's traffic; int4 makes it a quarter of the bf16 bytes). On TPU
    the decode path dequantizes in VMEM via the Pallas kernels
    (``ops/pallas_kernels.decode_cross_attention_q8``/``_q4``); off-TPU
    the scales fold into q (K side) / the attention output (V side)
    around einsums, so no bf16 copy ever materializes.
    """
    head_dim = dims.n_text_state // dims.n_text_head
    B, Ta, _ = enc.shape

    def per_layer(p):
        k = linear(p["cross"]["k"], enc, dtype)
        v = linear(p["cross"]["v"], enc, dtype)
        k = k.reshape(B, Ta, dims.n_text_head, head_dim).transpose(0, 2, 1, 3)
        v = v.reshape(B, Ta, dims.n_text_head, head_dim).transpose(0, 2, 1, 3)
        return k, v

    if not quantize:
        return jax.vmap(per_layer)(params["decoder"]["blocks"])
    if bits not in (8, 4):
        raise ValueError(f"cross-KV bits must be 8 or 4, got {bits}")

    # single-layer quantizers on (B, H, Ta, D); element math identical to
    # the old stacked form
    def quant(x):
        amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=(2, 3),
                       keepdims=True)
        scale = jnp.maximum(amax, 1e-9) / 127.0
        q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale),
                     -127, 127).astype(jnp.int8)
        # TRANSPOSE to (B, H, head_dim, Ta): int8 min tile is (32, 128),
        # so the long time axis must be the lane dimension for the Pallas
        # decode kernel (ops/pallas_kernels.decode_cross_attention_q8)
        return q.transpose(0, 1, 3, 2), scale

    def quant4(x):  # x (B, H, Ta, D)
        xf = x.astype(jnp.float32)
        amax = jnp.max(jnp.abs(xf), axis=2, keepdims=True)  # (B,H,1,D)
        scale = jnp.maximum(amax, 1e-9) / 7.0
        q = jnp.clip(jnp.round(xf / scale), -7, 7).astype(jnp.int8)
        qt = q.transpose(0, 1, 3, 2)  # (B, H, D, Ta)
        half = head_dim // 2
        packed = (qt[:, :, :half] & jnp.int8(0x0F)) | (qt[:, :, half:] << 4)
        return packed.astype(jnp.int8), scale

    qfn = quant if bits == 8 else quant4

    # quantize layer-BY-layer (lax.map = scan): the stacked bf16 K/V and
    # the fp32 quantization intermediates never materialize across all L
    # layers at once. The old vmapped form's fp32 temps were 2×7.3 GB at
    # window batch 32 on large-v3 — THE wb32 OOM, not the resident cache
    # (the int8 cache itself is 3.9 GB). Per-layer temps are 1/L of that;
    # same FLOPs, one-time cost before the decode loop.
    def per_layer_q(p):
        k, v = per_layer(p)
        return qfn(k), qfn(v)

    (k_q, k_s), (v_q, v_s) = jax.lax.map(
        per_layer_q, params["decoder"]["blocks"])
    return k_q, v_q, k_s, v_s


def decoder_forward(
    params: Params,
    dims: WhisperDims,
    tokens: jax.Array,  # (B, T) int32
    cross_kv: tuple[jax.Array, jax.Array],
    pos_offset: jax.Array | int = 0,
    self_cache: tuple[jax.Array, jax.Array] | None = None,  # (L,B,H,Tc,D)
    dtype: jnp.dtype = jnp.bfloat16,
    collect_cross_weights: bool | str = False,
) -> tuple[jax.Array, tuple[jax.Array, jax.Array] | None, jax.Array | None]:
    """Decoder pass (teacher-forced when T>1, incremental when cached).

    Returns (logits (B,T,vocab), updated self_cache, cross_weights or
    None). ``collect_cross_weights=True`` stacks the raw per-layer
    weights (L, B, H, T, Ta) — fine for tiny test dims, but on large-v3
    at window batch 16 that tensor is ~70 GB and its compile crashes the
    backend. ``"alignment_mean"`` instead accumulates the DTW alignment
    statistic (mean over the upper half of layers and all heads) in the
    scan carry, returning (B, T, Ta) fp32 with a flat ~(B·T·Ta) footprint
    — the form the word-timestamp pass consumes.
    """
    dec = params["decoder"]
    B, T = tokens.shape
    n_heads = dims.n_text_head
    # cross_kv: (ck, cv) bf16, or (ck_i8, cv_i8, k_scale, v_scale)
    quantized = len(cross_kv) == 4
    if quantized:
        ck, cv, ks, vs = cross_kv
    else:
        ck, cv = cross_kv
        L_ = ck.shape[0]
        ks = vs = jnp.ones((L_, 1, 1, 1, 1), jnp.float32)

    x = dec["tok_emb"]["table"].astype(dtype)[tokens]
    pos = jax.lax.dynamic_slice_in_dim(dec["pos_emb"], pos_offset, T, axis=0)
    x = x + pos.astype(dtype)

    if self_cache is not None:
        Tc = self_cache[0].shape[3]
        self_mask = make_causal_mask(T, Tc, offset=pos_offset)
        # also mask not-yet-written cache slots ≥ pos_offset+T
        written = jnp.arange(Tc)[None, :] < pos_offset + T
        self_mask = self_mask & written
    else:
        self_mask = make_causal_mask(T, T)

    L_total = ck.shape[0]
    reduce_mode = collect_cross_weights == "alignment_mean"

    def block(carry, layer):
        if reduce_mode:
            x, acc = carry
        else:
            x = carry
        p, layer_ck, layer_cv, layer_ks, layer_vs, layer_sk, layer_sv, \
            layer_idx = layer
        cache = (layer_sk, layer_sv) if self_cache is not None else None
        h, new_cache = mha(
            p["attn"], layer_norm(p["ln1"], x), n_heads,
            mask=self_mask, cache=cache,
            cache_index=pos_offset if cache is not None else None,
            dtype=dtype,
        )
        x = x + h
        if collect_cross_weights:
            h, w = _cross_with_kv(p, x, layer_ck, layer_cv, n_heads, dtype,
                                  True, layer_ks, layer_vs)
        else:
            h = _cross_with_kv(p, x, layer_ck, layer_cv, n_heads, dtype,
                               False, layer_ks, layer_vs)
            w = jnp.zeros((1,), jnp.float32)  # scan needs a consistent pytree
        x = x + h
        x = x + mlp(p["mlp"], layer_norm(p["ln_mlp"], x), dtype)
        out_cache = new_cache if new_cache is not None else (layer_sk, layer_sv)
        if reduce_mode:
            # accumulate the upper-half-layer, head-averaged alignment
            # statistic in the CARRY: the stacked (L, B, H, T, Ta) weight
            # tensor never materializes
            upper = (layer_idx >= L_total // 2).astype(jnp.float32)
            acc = acc + upper * jnp.mean(w, axis=1)
            return (x, acc), (out_cache[0], out_cache[1])
        return x, (out_cache[0], out_cache[1], w)

    if self_cache is not None:
        sk, sv = self_cache
    else:
        head_dim = dims.n_text_state // n_heads
        sk = jnp.zeros((L_total, B, n_heads, 1, head_dim), dtype)
        sv = sk
    xs = (dec["blocks"], ck, cv, ks, vs, sk, sv, jnp.arange(L_total))
    if reduce_mode:
        Ta = ck.shape[3] if not quantized else ck.shape[4]
        acc0 = jnp.zeros((B, T, Ta), jnp.float32)
        (x, acc), (new_sk, new_sv) = jax.lax.scan(block, (x, acc0), xs)
        cross_w = acc / float(L_total - L_total // 2)
    else:
        x, (new_sk, new_sv, cross_w) = jax.lax.scan(block, x, xs)
    x = layer_norm(dec["ln"], x)
    logits = jnp.dot(
        x, dec["tok_emb"]["table"].astype(dtype).T,
        preferred_element_type=jnp.float32,
    )
    new_cache = (new_sk, new_sv) if self_cache is not None else None
    return logits, new_cache, (cross_w if collect_cross_weights else None)


def _unpack_kv4(x4: jax.Array) -> jax.Array:
    """(…, D/2, Ta) half-split nibble-packed int4 → (…, D, Ta) int8 values
    (as int8; exact in bf16/f32). Fallback-path inverse of
    :func:`precompute_cross_kv`'s ``quant4`` packing — on TPU the decode
    kernel unpacks in VMEM instead and this never materializes."""
    xi = x4.astype(jnp.int32)
    lo = (xi << 28) >> 28
    hi = xi >> 4
    return jnp.concatenate([lo, hi], axis=-2).astype(jnp.int8)


def _cross_with_kv(
    p: Params, x: jax.Array, k: jax.Array, v: jax.Array, n_heads: int,
    dtype: jnp.dtype, return_weights: bool,
    k_scale: jax.Array | None = None, v_scale: jax.Array | None = None,
    q8: Params | None = None,  # per-layer int8 weights (cross_q/cross_o)
):
    """Cross-attention against precomputed K/V.

    bf16 K/V arrive as (B, H, Ta, D); int8 K/V arrive TRANSPOSED as
    (B, H, D, Ta) with per-(B, H) fp32 scales. On TPU the single-query
    (decode-loop) int8 case runs the Pallas kernel — dequant happens in
    VMEM, so the HBM read stays half-width (XLA's own int8 lowering
    measured 4.7× slower); elsewhere the scales fold into q (K side) and
    the attention output (V side) around plain einsums.
    """
    B, T, d_model = x.shape
    head_dim = d_model // n_heads
    quantized = k.dtype == jnp.int8
    # int4 cross-KV is nibble-packed along head_dim (see
    # precompute_cross_kv): distinguished from int8 by the halved axis
    packed4 = quantized and k.shape[-2] == head_dim // 2
    xn = layer_norm(p["ln_cross"], x)
    if q8 is None:
        q = linear(p["cross"]["q"], xn, dtype)
    else:
        q = linear_q8(p["cross"]["q"], q8["cross_q"], xn, dtype)
    q = q.reshape(B, T, n_heads, head_dim).transpose(0, 2, 1, 3)
    scale = head_dim ** -0.5

    def out_proj(o):
        if q8 is None:
            return linear(p["cross"]["o"], o, dtype)
        return linear_q8(p["cross"]["o"], q8["cross_o"], o, dtype)

    if quantized and T <= 8 and not return_weights:
        # T==1 is the greedy decode loop; 1<T<=8 is beam search, where the
        # K beams of a row ride the kernel's M dimension (shared K/V read
        # once per row). Larger T (teacher-forced) takes the einsum path.
        from audio_rag_tpu.ops.pallas_kernels import (
            decode_cross_attention_q4,
            decode_cross_attention_q8,
            on_tpu,
        )

        if on_tpu(k):
            kern = decode_cross_attention_q4 if packed4 \
                else decode_cross_attention_q8
            o = kern(q, k, v, k_scale, v_scale)
            o = o.astype(dtype).transpose(0, 2, 1, 3).reshape(B, T, d_model)
            return out_proj(o)

    if quantized:
        # fallback einsums on the transposed layout (CPU, teacher-forced);
        # the scale folds are shape-agnostic between int8's per-(B, H)
        # (B, H, 1, 1) and int4's per-channel (B, H, 1, D)
        if packed4:
            k, v = _unpack_kv4(k), _unpack_kv4(v)
        q = (q.astype(jnp.float32) * k_scale).astype(dtype)
        logits = jnp.einsum("bhqd,bhdk->bhqk", q * scale, k.astype(dtype),
                            preferred_element_type=jnp.float32)
        probs32 = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum("bhqk,bhdk->bhqd", probs32.astype(dtype),
                         v.astype(dtype),
                         preferred_element_type=jnp.float32)
        out = out * v_scale
    else:
        logits = jnp.einsum("bhqd,bhkd->bhqk", q * scale, k.astype(dtype),
                            preferred_element_type=jnp.float32)
        probs32 = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum("bhqk,bhkd->bhqd", probs32.astype(dtype),
                         v.astype(dtype),
                         preferred_element_type=jnp.float32)
    out = out.astype(dtype)
    out = out.transpose(0, 2, 1, 3).reshape(B, T, d_model)
    out = out_proj(out)
    if return_weights:
        return out, probs32
    return out


def quantize_decoder_weights(params: Params, dims: WhisperDims,
                             bits: int = 8,
                             lm_head_bits: int | None = None) -> Params:
    """Per-out-channel int8 (``bits=8``) or group-wise int4 (``bits=4``,
    :func:`~audio_rag_tpu.models.layers.quantize_linear_q4`) of every
    weight matrix the decode loop re-reads each token (attention/cross/
    MLP linears + the logits head).

    The decode loop's weight term is ≈1.6 GB/step bf16 on large-v3; int8
    halves it and :func:`linear_q8`'s Pallas kernel dequantizes in VMEM.
    Returned as PER-LAYER lists (not stacked) so the jitted decode
    programs receive each layer's matrices as separate buffers — XLA
    re-sinks "free" slices of stacked arrays into the loop body, which
    made Mosaic re-materialize Pallas operands every token (see
    greedy_decode's cross-KV barrier note). The logits head (tok_emb
    transposed) pads the vocab axis to a lane multiple; the all-zero pad
    columns quantize to weight 0 (tiny scale) and decode as exactly-0
    logits — which would still beat real logits when every real logit is
    negative, so callers must slice ``[:, :n_vocab]`` —
    :func:`decoder_step` does.

    ``lm_head_bits`` overrides ``bits`` for the logits head only — the
    on-chip kernel table (docs/PERFORMANCE.md "int4 decode paths") shows
    the (1280, 51968) vocab projection is the one decode matmul where
    int4 beats int8 (0.100 vs 0.186 ms at B=16: the unpack cost is fixed
    per tile while the bandwidth saved scales with the huge dout), so
    the mixed int8-blocks + int4-head profile (``ASRConfig.lm_head_int4``)
    keeps int8's attention/MLP speed and takes int4's head win. Same
    pattern as :func:`audio_rag_tpu.models.llm.quantize_decoder_weights`.
    """
    dec = params["decoder"]
    if bits not in (8, 4):
        raise ValueError(f"bits must be 8 or 4, got {bits}")
    lm_bits = lm_head_bits if lm_head_bits is not None else bits
    if lm_bits not in (8, 4):
        raise ValueError(f"lm_head_bits must be 8 or 4, got {lm_bits}")
    quant = quantize_linear if bits == 8 else quantize_linear_q4
    head_quant = quantize_linear if lm_bits == 8 else quantize_linear_q4

    def q(p):
        return quant(p["w"])

    blocks = []
    for layer in range(dims.n_text_layer):
        p = jax.tree.map(lambda a: a[layer], dec["blocks"])
        blocks.append({
            "attn_q": q(p["attn"]["q"]), "attn_k": q(p["attn"]["k"]),
            "attn_v": q(p["attn"]["v"]), "attn_o": q(p["attn"]["o"]),
            "cross_q": q(p["cross"]["q"]), "cross_o": q(p["cross"]["o"]),
            "mlp_up": q(p["mlp"]["up"]), "mlp_down": q(p["mlp"]["down"]),
        })
    table = dec["tok_emb"]["table"]
    vocab = table.shape[0]
    vocab_pad = -(-vocab // 128) * 128
    wt = jnp.pad(table.astype(jnp.float32).T,
                 ((0, 0), (0, vocab_pad - vocab)))
    return {"blocks": blocks, "logits": head_quant(wt)}


def quantize_self_cache(
    sk: jax.Array,  # (L, B, H, C, hd) primed bf16/f32 self-K cache
    sv: jax.Array,
    n_valid: jax.Array | int,  # positions < n_valid hold real K/V
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """One-shot conversion of a primed self cache to the int8 decode
    representation: (k8 (L, B, H, hd, Cp) int8, v8 likewise, packed
    scales (L, B, Cp, 128) f32) for
    :func:`~audio_rag_tpu.ops.pallas_kernels.decode_self_attention_q8`.

    Per-POSITION symmetric scales (amax over head_dim — 64 values per
    scale group, finer than the cross KV's per-(B, H)); C pads up to a
    lane multiple (Cp) for the int8 tile, with padded positions masked
    invalid. Runs once after prompt priming; the decode loop then
    quantizes each new position at write time (:func:`decoder_step`
    with ``self_kv_int8``).
    """
    from audio_rag_tpu.ops.pallas_kernels import pack_self_scales

    L, B, H, C, hd = sk.shape
    Cp = -(-C // 128) * 128

    def q(x):
        xf = x.astype(jnp.float32)
        a = jnp.max(jnp.abs(xf), axis=-1)  # (L, B, H, C)
        s = jnp.where(a > 0, a / 127.0, 1.0)
        x8 = jnp.round(xf / s[..., None]).astype(jnp.int8)
        x8 = jnp.pad(x8.transpose(0, 1, 2, 4, 3),  # (L, B, H, hd, C)
                     ((0, 0),) * 4 + ((0, Cp - C),))
        return x8, jnp.pad(s, ((0, 0),) * 3 + ((0, Cp - C),))

    k8, ks = q(sk)
    v8, vs = q(sv)
    valid = jnp.broadcast_to(
        jnp.arange(Cp) < n_valid, (L, B, Cp))
    return k8, v8, pack_self_scales(ks, vs, valid)


def q8_param_bytes(dims: WhisperDims, bits: int = 8,
                   lm_head_bits: int | None = None) -> int:
    """HBM bytes of the :func:`quantize_decoder_weights` copies (int8/int4
    weights + fp32 scales: per-out-channel at 8 bits, per-(din-group,
    out-channel) at 4). The quantized copies coexist with the bf16
    params, so backends must add this to their HBM budget when
    ``decoder_int8``/``decoder_int4`` is enabled (~0.8 GB for large-v3
    int8, ~0.45 GB int4). ``lm_head_bits`` mirrors
    :func:`quantize_decoder_weights`'s mixed profile."""
    d = dims.n_text_state
    vocab_pad = -(-dims.n_vocab // 128) * 128
    # per layer: attn q/k/v/o (4·d²) + cross q/o (2·d²) + mlp up/down (8·d²)
    block_mats = ([(d, d)] * 6 + [(d, 4 * d), (4 * d, d)]) \
        * dims.n_text_layer
    lm_bits = lm_head_bits if lm_head_bits is not None else bits

    def tally(mats, b):
        w = sum(din * dout for din, dout in mats)
        if b == 8:
            return w + 4 * sum(dout for _, dout in mats)
        from audio_rag_tpu.ops.pallas_kernels import q4_group

        scales = sum((din // q4_group(din)) * dout for din, dout in mats)
        return w // 2 + 4 * scales

    return tally(block_mats, bits) + tally([(d, vocab_pad)], lm_bits)


def decoder_step(
    params: Params,
    dims: WhisperDims,
    tok: jax.Array,  # (B, 1) int32 — the decode loop's current token
    cross_kv,
    pos,  # scalar int32 — KV write index / position of ``tok``
    self_cache: tuple[jax.Array, jax.Array],  # (L, B, H, C, hd) ×2
    dtype: jnp.dtype = jnp.bfloat16,
    q8: Params | None = None,  # quantize_decoder_weights output
    beams: int = 1,  # >1: rows are beam groups sharing cross KV per group
    beam_mask: jax.Array | None = None,  # (B/K, K, K, C) ancestry mask
    self_kv_int8: bool = False,  # self_cache is the int8 triple
) -> tuple[jax.Array, tuple[jax.Array, jax.Array]]:
    """One incremental decode step with the layer loop UNROLLED.

    ``beams=K``: ``tok``/``self_cache`` carry B·K rows while ``cross_kv``
    carries only B — the K beams of a group attend to the SAME encoder
    states, so the cross K/V (the decode loop's dominant HBM term) is
    stored and re-read once per group instead of once per beam. The K
    beam queries become the M dimension of the cross-attention dot
    (cross attention has no causal mask, so M independent queries are
    exactly M beams).

    ``beam_mask`` (with ``beams=K``) switches self-attention to the
    LAZY-ANCESTRY beam layout: the self cache is (L, B/K, H, K, C, hd),
    rows stay in BIRTH order (no per-step physical reorder — the
    one-hot reorder's read+write of the whole cache was ~2/3 of beam's
    per-step HBM traffic), and ``beam_mask[g, n, k, c]`` says "beam n of
    group g may attend to position c of PHYSICAL row k" — beam search's
    hypothesis reordering expressed as a mask the caller permutes
    (K×K·C per group, trivial bytes) instead of permuting the caches.
    Scores are computed all-pairs over (k, c) — a K× FLOP amplification
    that rides the otherwise-idle MXU while the cache is read exactly
    once — then masked and softmaxed over the flattened (k, c) axis,
    which selects exactly one physical row per position: numerically the
    per-row softmax over the reordered cache. The mask also encodes
    causal validity (unset ⇒ unwritten or future position).

    ``self_kv_int8`` switches the SELF cache to int8 with per-position
    scales: ``self_cache`` is then the triple (k8 (L, B, H, hd, Cp)
    int8, v8 likewise, scales (L, B, Cp, 128) f32 — the packed
    scales+mask operand of
    :func:`~audio_rag_tpu.ops.pallas_kernels.decode_self_attention_q8`,
    built by :func:`quantize_self_cache`). Each step quantizes the new
    K/V position at write time (amax over head_dim) and the same packed
    row-write flips the position's mask lane valid, so the loop carries
    no separate causal state. Halves the decode loop's self-cache HBM
    read. Greedy only (``beams == 1``, no ``beam_mask``).

    Inside a ``while_loop``, a ``lax.scan`` over layers was measured at
    ~2× the unrolled cost (6.1 vs 3.2 ms/step for the bare cross-attention
    stack on a v5e — the scan's per-layer slicing of the loop-invariant
    cross KV doesn't stay in place). Unrolling trades one-time compile
    size for the hot loop running at memory speed; the teacher-forced and
    prompt-priming paths keep :func:`decoder_forward`'s scan (they run
    once per window, not per token). With ``q8`` the weight matmuls read
    int8 weights through the Pallas dequant-in-VMEM kernel (the decode
    loop's weight bytes halve). Returns (last-token logits (B, vocab)
    fp32, updated self_cache).
    """
    dec = params["decoder"]
    quantized = len(cross_kv) == 4
    if quantized:
        ck, cv, ks, vs = cross_kv
    else:
        ck, cv = cross_kv
        ks = vs = None
    B = tok.shape[0]
    H = dims.n_text_head
    hd = dims.n_text_state // H
    lazy = beam_mask is not None
    if self_kv_int8:
        if lazy or beams > 1:
            raise ValueError("self_kv_int8 is greedy-only")
        sk, sv, scp = self_cache
        C = sk.shape[4]  # (L, B, H, hd, Cp)
    elif lazy:
        # beams == 1 degenerates to plain masked attention (K=1 row)
        sk, sv = self_cache
        C = sk.shape[4]  # (L, B/K, H, K, C, hd)
        G = B // beams
    else:
        sk, sv = self_cache
        C = sk.shape[3]

    x = dec["tok_emb"]["table"].astype(dtype)[tok]  # (B, 1, d)
    posv = jax.lax.dynamic_slice_in_dim(dec["pos_emb"], pos, 1, axis=0)
    x = x + posv.astype(dtype)
    mask = jnp.arange(C)[None, None, None, :] < pos + 1  # (1,1,1,C)
    scale = hd ** -0.5

    for layer in range(dims.n_text_layer):
        p = jax.tree.map(lambda a: a[layer], dec["blocks"])
        p8 = None if q8 is None else q8["blocks"][layer]

        def lin(pp, key8, xx):
            if p8 is None:
                return linear(pp, xx, dtype)
            return linear_q8(pp, p8[key8], xx, dtype)

        xn = layer_norm(p["ln1"], x)
        if self_kv_int8:
            # int8 self-KV: quantize the new position at write time
            # (amax over head_dim → one scale per (b, h, position)); the
            # packed scale row's mask lane flips this position valid in
            # the same write. Attention reads the int8 cache through the
            # in-VMEM-dequant kernel — the self cache's HBM bytes halve.
            from audio_rag_tpu.ops.pallas_kernels import (
                decode_self_attention_q8,
            )

            q = lin(p["attn"]["q"], "attn_q", xn).reshape(
                B, 1, H, hd).transpose(0, 2, 1, 3)  # (B, H, 1, hd)
            k = lin(p["attn"]["k"], "attn_k", xn).reshape(
                B, 1, H, hd).transpose(0, 2, 1, 3).astype(jnp.float32)
            v = lin(p["attn"]["v"], "attn_v", xn).reshape(
                B, 1, H, hd).transpose(0, 2, 1, 3).astype(jnp.float32)
            ka = jnp.max(jnp.abs(k), axis=-1)  # (B, H, 1)
            va = jnp.max(jnp.abs(v), axis=-1)
            ksc = jnp.where(ka > 0, ka / 127.0, 1.0)
            vsc = jnp.where(va > 0, va / 127.0, 1.0)
            k8n = jnp.round(k / ksc[..., None]).astype(jnp.int8)
            v8n = jnp.round(v / vsc[..., None]).astype(jnp.int8)
            sk = jax.lax.dynamic_update_slice(
                sk, k8n.transpose(0, 1, 3, 2)[None],  # (1, B, H, hd, 1)
                (layer, 0, 0, 0, pos))
            sv = jax.lax.dynamic_update_slice(
                sv, v8n.transpose(0, 1, 3, 2)[None],
                (layer, 0, 0, 0, pos))
            row = jnp.zeros((B, 128), jnp.float32)
            row = row.at[:, :H].set(ksc[:, :, 0])
            row = row.at[:, H:2 * H].set(vsc[:, :, 0])
            # lane 2H stays 0.0 == "valid" for this position
            scp = jax.lax.dynamic_update_slice(
                scp, row[None, :, None, :], (layer, 0, pos, 0))
            o = decode_self_attention_q8(q, sk[layer], sv[layer],
                                         scp[layer])
            o = o.astype(dtype).transpose(0, 2, 1, 3).reshape(
                B, 1, dims.n_text_state)
        elif lazy:
            # lazy-ancestry beam self-attention over the (G, H, K, C, hd)
            # cache: write each beam's new K/V at ITS OWN physical row
            # (birth order), score all (row, position) pairs, and let the
            # caller-permuted mask select each beam's true history
            q = lin(p["attn"]["q"], "attn_q", xn).reshape(
                G, beams, H, hd).transpose(0, 2, 1, 3)  # (G, H, K, hd)
            k = lin(p["attn"]["k"], "attn_k", xn).reshape(
                G, beams, H, hd).transpose(0, 2, 1, 3)
            v = lin(p["attn"]["v"], "attn_v", xn).reshape(
                G, beams, H, hd).transpose(0, 2, 1, 3)
            sk = jax.lax.dynamic_update_slice(
                sk, k[None, :, :, :, None].astype(sk.dtype),
                (layer, 0, 0, 0, pos, 0))
            sv = jax.lax.dynamic_update_slice(
                sv, v[None, :, :, :, None].astype(sv.dtype),
                (layer, 0, 0, 0, pos, 0))
            # (G,H,n,d)·(G,H,k,c,d) → (G,H,n,k,c): batch (G,H), no big
            # transposes — k and c are adjacent in the cache layout
            s = jnp.einsum("ghnd,ghkcd->ghnkc", q * scale, sk[layer],
                           preferred_element_type=jnp.float32)
            s = jnp.where(beam_mask[:, None], s, -1e30)
            # softmax over flattened (k, c): exactly one unmasked row per
            # valid position ⇒ equals the per-row softmax over c
            sflat = s.reshape(G, H, beams, beams * C)
            probs = jax.nn.softmax(sflat, axis=-1).astype(dtype).reshape(
                G, H, beams, beams, C)
            o = jnp.einsum("ghnkc,ghkcd->ghnd", probs, sv[layer],
                           preferred_element_type=jnp.float32).astype(dtype)
            o = o.transpose(0, 2, 1, 3).reshape(B, 1, dims.n_text_state)
        else:
            q = lin(p["attn"]["q"], "attn_q", xn).reshape(
                B, 1, H, hd).transpose(0, 2, 1, 3)
            k = lin(p["attn"]["k"], "attn_k", xn).reshape(
                B, 1, H, hd).transpose(0, 2, 1, 3)
            v = lin(p["attn"]["v"], "attn_v", xn).reshape(
                B, 1, H, hd).transpose(0, 2, 1, 3)
            # write this step's K/V at (layer, :, :, pos) — static layer
            # index, dynamic position; XLA keeps the stacked cache in place
            sk = jax.lax.dynamic_update_slice(
                sk, k[None].astype(sk.dtype), (layer, 0, 0, pos, 0))
            sv = jax.lax.dynamic_update_slice(
                sv, v[None].astype(sv.dtype), (layer, 0, 0, pos, 0))
            s = jnp.einsum("bhqd,bhkd->bhqk", q * scale, sk[layer],
                           preferred_element_type=jnp.float32)
            s = jnp.where(mask, s, -1e30)
            probs = jax.nn.softmax(s, axis=-1).astype(dtype)
            o = jnp.einsum("bhqk,bhkd->bhqd", probs, sv[layer],
                           preferred_element_type=jnp.float32).astype(dtype)
            o = o.transpose(0, 2, 1, 3).reshape(B, 1, dims.n_text_state)
        x = x + lin(p["attn"]["o"], "attn_o", o)
        if beams > 1:
            # fold the beam dim into the query T axis: (B·K, 1, d) →
            # (B, K, d) against the group's single cross KV row
            xc = x.reshape(B // beams, beams, dims.n_text_state)
            h = _cross_with_kv(
                p, xc, ck[layer], cv[layer], H, dtype, False,
                None if ks is None else ks[layer],
                None if vs is None else vs[layer],
                q8=p8,
            )
            x = x + h.reshape(B, 1, dims.n_text_state)
        else:
            x = x + _cross_with_kv(
                p, x, ck[layer], cv[layer], H, dtype, False,
                None if ks is None else ks[layer],
                None if vs is None else vs[layer],
                q8=p8,
            )
        if p8 is None:
            x = x + mlp(p["mlp"], layer_norm(p["ln_mlp"], x), dtype)
        else:
            h = jax.nn.gelu(
                lin(p["mlp"]["up"], "mlp_up", layer_norm(p["ln_mlp"], x)),
                approximate=False)
            x = x + lin(p["mlp"]["down"], "mlp_down", h)

    x = layer_norm(dec["ln"], x)
    if q8 is None:
        logits = jnp.dot(
            x[:, 0], dec["tok_emb"]["table"].astype(dtype).T,
            preferred_element_type=jnp.float32,
        )
    else:
        logits = linear_q8({}, q8["logits"], x[:, 0],
                           dtype=jnp.float32)[:, :dims.n_vocab]
    if self_kv_int8:
        return logits, (sk, sv, scp)
    return logits, (sk, sv)


def ngram_draft(
    tokens: jax.Array,  # (B, total) int32, valid through n_tok per row
    n_tok: jax.Array,   # (B,) int32 — index of each row's last valid token
    draft_len: int,
) -> jax.Array:
    """Prompt-lookup drafting: propose ``draft_len`` continuation tokens by
    copying what followed the most recent earlier occurrence of the row's
    final 2-gram (the vLLM/"prompt lookup decoding" n-gram drafter —
    public technique, no draft model). Wrong drafts cost nothing but their
    slot in the verify block; the verifier guarantees exact greedy output.
    Rows with no match repeat their last token (period-1 loops are the
    most common repetition mode). All ops are vectorized (B, total)
    comparisons — VPU noise next to a decoder step.
    """
    B, total = tokens.shape
    b_idx = jnp.arange(B)
    g1 = tokens[b_idx, n_tok]                      # last token
    g0 = tokens[b_idx, jnp.maximum(n_tok - 1, 0)]  # one before
    idx = jnp.arange(total - 1)
    # match positions s: (tokens[s], tokens[s+1]) == (g0, g1), s+1 < n_tok
    m = (
        (tokens[:, :-1] == g0[:, None])
        & (tokens[:, 1:] == g1[:, None])
        & (idx[None, :] + 1 < n_tok[:, None])
    )
    s = jnp.max(jnp.where(m, idx[None, :], -1), axis=1)  # (B,) latest match
    src = jnp.clip(s[:, None] + 2 + jnp.arange(draft_len)[None, :],
                   0, total - 1)
    drafts = jnp.take_along_axis(tokens, src, axis=1)  # (B, draft_len)
    return jnp.where(s[:, None] >= 0, drafts, g1[:, None])


def decoder_block_verify(
    params: Params,
    dims: WhisperDims,
    block: jax.Array,  # (B, k) int32 — [cur, draft_1..draft_{k-1}]
    cross_kv,
    pos: jax.Array,  # (B,) int32 — per-row KV write index of block[:, 0]
    self_cache: tuple[jax.Array, jax.Array],  # (L, B, H, C, hd) ×2
    dtype: jnp.dtype = jnp.bfloat16,
    q8: Params | None = None,
) -> tuple[jax.Array, tuple[jax.Array, jax.Array]]:
    """Teacher-forced k-token step with PER-ROW positions — the verify
    pass of speculative decoding.

    One invocation consumes a k-token block per row: the decoder weights
    and (crucially) the cross K/V — the decode loop's dominant HBM term —
    are read ONCE for k tokens instead of once per token. The k queries
    ride the cross-attention dot's M dimension (same mechanism as beam
    search; the int8 Pallas kernel takes M≤8 directly). Per-row positions
    let each batch row advance by its own acceptance count. Layer loop
    UNROLLED like :func:`decoder_step` (a scan measured ~2× slower in
    decode loops). Returns (logits (B, k, vocab) fp32, updated cache).
    """
    dec = params["decoder"]
    quantized = len(cross_kv) == 4
    if quantized:
        ck, cv, ks, vs = cross_kv
    else:
        ck, cv = cross_kv
        ks = vs = None
    sk, sv = self_cache
    B, k = block.shape
    H = dims.n_text_head
    hd = dims.n_text_state // H
    C = sk.shape[3]
    b_idx = jnp.arange(B)
    h_idx = jnp.arange(H)

    x = dec["tok_emb"]["table"].astype(dtype)[block]  # (B, k, d)
    pe_idx = jnp.clip(pos[:, None] + jnp.arange(k)[None, :],
                      0, dims.n_text_ctx - 1)
    x = x + dec["pos_emb"][pe_idx].astype(dtype)
    # query j (at stream position pos+j) may attend cache slots c ≤ pos+j
    cpos = jnp.clip(pos[:, None] + jnp.arange(k)[None, :], 0, C - 1)  # (B,k)
    mask = (jnp.arange(C)[None, None, None, :]
            <= cpos[:, None, :, None])  # (B, 1, k, C)
    scale = hd ** -0.5

    for layer in range(dims.n_text_layer):
        p = jax.tree.map(lambda a: a[layer], dec["blocks"])
        p8 = None if q8 is None else q8["blocks"][layer]

        def lin(pp, key8, xx):
            if p8 is None:
                return linear(pp, xx, dtype)
            return linear_q8(pp, p8[key8], xx, dtype)

        xn = layer_norm(p["ln1"], x)
        q = lin(p["attn"]["q"], "attn_q", xn).reshape(
            B, k, H, hd).transpose(0, 2, 1, 3)
        kk = lin(p["attn"]["k"], "attn_k", xn).reshape(
            B, k, H, hd).transpose(0, 2, 1, 3)
        vv = lin(p["attn"]["v"], "attn_v", xn).reshape(
            B, k, H, hd).transpose(0, 2, 1, 3)
        # per-row scatter: row b writes its k fresh K/V at pos_b..pos_b+k-1
        sk = sk.at[layer, b_idx[:, None, None], h_idx[None, :, None],
                   cpos[:, None, :], :].set(
            kk.astype(sk.dtype))
        sv = sv.at[layer, b_idx[:, None, None], h_idx[None, :, None],
                   cpos[:, None, :], :].set(
            vv.astype(sv.dtype))
        s = jnp.einsum("bhqd,bhkd->bhqk", q * scale, sk[layer],
                       preferred_element_type=jnp.float32)
        s = jnp.where(mask, s, -1e30)
        probs = jax.nn.softmax(s, axis=-1).astype(dtype)
        o = jnp.einsum("bhqk,bhkd->bhqd", probs, sv[layer],
                       preferred_element_type=jnp.float32).astype(dtype)
        o = o.transpose(0, 2, 1, 3).reshape(B, k, dims.n_text_state)
        x = x + lin(p["attn"]["o"], "attn_o", o)
        x = x + _cross_with_kv(
            p, x, ck[layer], cv[layer], H, dtype, False,
            None if ks is None else ks[layer],
            None if vs is None else vs[layer],
            q8=p8,
        )
        if p8 is None:
            x = x + mlp(p["mlp"], layer_norm(p["ln_mlp"], x), dtype)
        else:
            h = jax.nn.gelu(
                lin(p["mlp"]["up"], "mlp_up", layer_norm(p["ln_mlp"], x)),
                approximate=False)
            x = x + lin(p["mlp"]["down"], "mlp_down", h)

    x = layer_norm(dec["ln"], x)
    if q8 is None:
        logits = jnp.dot(
            x, dec["tok_emb"]["table"].astype(dtype).T,
            preferred_element_type=jnp.float32,
        )
    else:
        logits = linear_q8({}, q8["logits"], x,
                           dtype=jnp.float32)[..., :dims.n_vocab]
    return logits, (sk, sv)


def speculative_greedy_decode(
    params: Params,
    dims: WhisperDims,
    enc: jax.Array,  # (B, Ta, d)
    prompt: jax.Array,  # (B, P) int32 SOT sequence
    max_new_tokens: int,
    eot: int,
    spec_k: int = 8,
    dtype: jnp.dtype = jnp.bfloat16,
    no_speech_id: int | None = None,
    cross_kv_quantize: bool = False,
    cross_kv_bits: int = 8,
    decoder_q8: Params | None = None,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Greedy decode with speculative multi-token steps — output is
    EXACTLY :func:`greedy_decode`'s (greedy verification accepts a draft
    token only when it equals the model's own argmax, and the bonus token
    IS the model's argmax).

    Decode is memory-bound at one token per step (BENCH_r02: 8% MFU,
    dominated by re-reading the cross KV and weights every token). Each
    iteration here drafts ``spec_k-1`` tokens with the zero-cost n-gram
    drafter (:func:`ngram_draft`), then verifies the whole block in ONE
    :func:`decoder_block_verify` pass: per accepted run of a+1 tokens the
    weights/cross-KV are read once instead of a+1 times. Worst case
    (nothing ever accepted) degrades to ≈1 read per token — the status
    quo. Rows advance independently (per-row positions), so one
    hard-to-draft window doesn't stall the batch.

    Returns (tokens (B, P+max_new), avg_logprob (B,), no_speech_prob (B,))
    with positions past EOT filled with ``eot`` — same contract as
    :func:`greedy_decode`.
    """
    B, P = prompt.shape
    L = dims.n_text_layer
    H = dims.n_text_head
    head_dim = dims.n_text_state // H
    k = spec_k
    total = P + max_new_tokens
    # cache headroom: a block write may extend k-1 slots past a row's
    # last real position
    cache_len = min(dims.n_text_ctx, total) + k

    cross_kv = precompute_cross_kv(params, dims, enc, dtype,
                                   quantize=cross_kv_quantize,
                                   bits=cross_kv_bits)
    sk = jnp.zeros((L, B, H, cache_len, head_dim), dtype)
    sv = jnp.zeros_like(sk)

    if cross_kv_quantize:
        # same split+barrier as greedy_decode (see its comment): per-layer
        # int8 buffers for the Pallas kernel, primed unrolled
        cross_kv = jax.lax.optimization_barrier(tuple(
            [part[layer] for layer in range(L)] for part in cross_kv
        ))
        logits = None
        for t in range(P):
            logits, (sk, sv) = decoder_step(
                params, dims, prompt[:, t:t + 1], cross_kv, t, (sk, sv),
                dtype=dtype, q8=decoder_q8,
            )
        step0 = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    else:
        logits, (sk, sv), _ = decoder_forward(
            params, dims, prompt, cross_kv, pos_offset=0,
            self_cache=(sk, sv), dtype=dtype,
        )
        step0 = jax.nn.log_softmax(
            logits[:, -1, :].astype(jnp.float32), axis=-1)
    no_speech_prob = (
        jnp.exp(step0[:, no_speech_id]) if no_speech_id is not None
        else jnp.zeros((B,), jnp.float32)
    )

    first = jnp.argmax(step0, axis=-1).astype(jnp.int32)
    first_lp = step0[jnp.arange(B), first]

    tokens = jnp.full((B, total), eot, jnp.int32)
    tokens = tokens.at[:, :P].set(prompt)
    tokens = tokens.at[:, P].set(first)
    finished = first == eot
    sum_lp = first_lp
    n_decoded = jnp.ones((B,), jnp.float32)
    n_tok = jnp.full((B,), P, jnp.int32)  # index of last valid token
    b_idx = jnp.arange(B)

    def cond(state):
        _, _, _, finished, _, _ = state
        return ~jnp.all(finished)

    def body(state):
        tokens, n_tok, (sk, sv), finished, sum_lp, n_decoded = state
        cur = tokens[b_idx, n_tok]  # (B,)
        drafts = ngram_draft(tokens, n_tok, k - 1)  # (B, k-1)
        block = jnp.concatenate([cur[:, None], drafts], axis=1)  # (B, k)
        logits, (sk, sv) = decoder_block_verify(
            params, dims, block, cross_kv, n_tok, (sk, sv),
            dtype=dtype, q8=decoder_q8,
        )
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        f = jnp.argmax(logp, axis=-1).astype(jnp.int32)  # (B, k)
        f_lp = jnp.take_along_axis(logp, f[..., None], axis=-1)[..., 0]

        # greedy acceptance: draft j+1 survives iff it equals the model's
        # own argmax f_j given the prefix; emitted tokens are therefore
        # f[:, 0..a] (accepted drafts ARE the argmaxes, plus the bonus)
        match = block[:, 1:] == f[:, :-1]  # (B, k-1)
        a = jnp.sum(jnp.cumprod(match.astype(jnp.int32), axis=1), axis=1)
        # stop at the first emitted EOT, and never write past total-1
        eot_pos = jnp.argmax(f == eot, axis=1)
        has_eot = jnp.any(f == eot, axis=1)
        a = jnp.where(has_eot, jnp.minimum(a, eot_pos), a)
        a = jnp.minimum(a, total - 2 - n_tok)  # emission bound

        j_grid = jnp.arange(k)[None, :]
        write = (j_grid <= a[:, None]) & ~finished[:, None]  # (B, k)
        # UNCLIPPED destinations + mode="drop": clipping to total-1 would
        # alias several j onto the last slot and the stale duplicate
        # would win the scatter; out-of-range writes are masked off by
        # the emission bound on ``a`` anyway
        dst = n_tok[:, None] + 1 + j_grid
        old = jnp.take_along_axis(
            tokens, jnp.clip(dst, 0, total - 1), axis=1)
        tokens = tokens.at[b_idx[:, None], dst].set(
            jnp.where(write, f, old), mode="drop")

        sum_lp = sum_lp + jnp.sum(jnp.where(write, f_lp, 0.0), axis=1)
        n_decoded = n_decoded + jnp.sum(write.astype(jnp.float32), axis=1)
        n_new = jnp.where(finished, 0, a + 1)
        n_tok = n_tok + n_new
        emitted_eot = jnp.any((f == eot) & write, axis=1)
        finished = finished | emitted_eot | (n_tok >= total - 1)
        return tokens, n_tok, (sk, sv), finished, sum_lp, n_decoded

    tokens, n_tok, _, finished, sum_lp, n_decoded = jax.lax.while_loop(
        cond, body, (tokens, n_tok, (sk, sv), finished, sum_lp, n_decoded),
    )
    # EOT-fill past each row's end (greedy_decode's contract): positions
    # after the last emitted token already hold eot by initialization and
    # the masked writes above, so nothing to clean up
    return tokens, sum_lp / jnp.maximum(n_decoded, 1.0), no_speech_prob


# -- greedy decode ---------------------------------------------------------

def greedy_decode(
    params: Params,
    dims: WhisperDims,
    enc: jax.Array,  # (B, Ta, d)
    prompt: jax.Array,  # (B, P) int32 SOT sequence
    max_new_tokens: int,
    eot: int,
    dtype: jnp.dtype = jnp.bfloat16,
    temperature: float = 0.0,
    rng: jax.Array | None = None,
    no_speech_id: int | None = None,
    cross_kv_quantize: bool = False,
    cross_kv_bits: int = 8,
    decoder_q8: Params | None = None,  # quantize_decoder_weights output
    self_kv_int8: bool = False,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Batched greedy/sampled decode with static KV cache.

    Returns (tokens (B, P+max_new), avg_logprob (B,), no_speech_prob (B,)).
    Positions past EOT are filled with ``eot``; ``avg_logprob`` is the mean
    chosen-token log-probability (the quality signal faster-whisper uses
    for its temperature-fallback ladder); ``no_speech_prob`` is read from
    the first decode step, as Whisper defines it. ``decoder_q8`` switches
    the decode loop's weight matmuls to int8 (the teacher-forced priming
    keeps full precision unless the cross KV is also quantized).
    ``self_kv_int8`` stores the loop's SELF cache int8 with per-position
    scales (:func:`quantize_self_cache` after priming, quantize-on-write
    in the loop) — with the cross KV and weights already quantized the
    bf16 self cache is the decode step's largest remaining HBM term.
    """
    B, P = prompt.shape
    L = dims.n_text_layer
    H = dims.n_text_head
    head_dim = dims.n_text_state // H
    total = P + max_new_tokens
    cache_len = min(dims.n_text_ctx, total)
    if rng is None:
        rng = jax.random.PRNGKey(0)

    cross_kv = precompute_cross_kv(params, dims, enc, dtype,
                                   quantize=cross_kv_quantize,
                                   bits=cross_kv_bits)

    sk = jnp.zeros((L, B, H, cache_len, head_dim), dtype)
    sv = jnp.zeros((L, B, H, cache_len, head_dim), dtype)

    if cross_kv_quantize and P > 16:
        # GUARD (latent compile blowup): the unrolled priming below emits
        # P × n_text_layer fully-unrolled decoder steps — fine for the
        # 4-token SOT prompt, but a faster-whisper-style 224-token
        # condition-on-previous-text prompt would be a ~7000-block program
        # whose compile hangs the minutes-per-program remote relay. Long
        # prompts prime teacher-forced through decoder_forward's layer
        # scan on the STACKED quantized KV instead, then split. Caveat:
        # stacked + split copies briefly coexist (the short-prompt path
        # avoids that; at window batch 16 on large-v3 the coexistence once
        # OOM'd a 16 GB chip — long-prompt callers should shrink batch).
        logits, (sk, sv), _ = decoder_forward(
            params, dims, prompt, cross_kv, pos_offset=0,
            self_cache=(sk, sv), dtype=dtype,
        )
        cross_kv = jax.lax.optimization_barrier(tuple(
            [part[layer] for layer in range(L)] for part in cross_kv
        ))
        step0 = jax.nn.log_softmax(
            logits[:, -1, :].astype(jnp.float32), axis=-1)
    elif cross_kv_quantize:
        # HOIST the per-layer split out of the decode loop AND pin it with
        # an optimization barrier: the Pallas kernel needs materialized
        # operands, XLA's cost model treats a slice-of-array as free and
        # re-sinks it into the loop body, and Mosaic then copies the
        # sliced (B, H, hd, Ta) int8 operand on EVERY call — measured
        # +5.5 ms/step, more than the kernel saves. The barrier forces the
        # 32 per-layer materializations to happen once, before the loop
        # (decoder_step is unchanged: Python lists index per layer exactly
        # like the stacked arrays do). With it: 8.7 ms/step int8 vs 11.6
        # bf16 at window batch 16.
        cross_kv = jax.lax.optimization_barrier(tuple(
            [part[layer] for layer in range(L)] for part in cross_kv
        ))
        # prime the cache with unrolled single-token steps over the SPLIT
        # lists: the split is then the stacked int8's only consumer, so it
        # dies there instead of coexisting with its per-layer copies
        # (stacked + copies + the priming pass OOM'd a 16 GB chip at
        # window batch 16)
        logits = None
        for t in range(P):
            logits, (sk, sv) = decoder_step(
                params, dims, prompt[:, t:t + 1], cross_kv, t, (sk, sv),
                dtype=dtype, q8=decoder_q8,
            )
        step0 = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    else:
        # prime the cache with the prompt (teacher-forced)
        logits, (sk, sv), _ = decoder_forward(
            params, dims, prompt, cross_kv, pos_offset=0,
            self_cache=(sk, sv), dtype=dtype,
        )
        step0 = jax.nn.log_softmax(
            logits[:, -1, :].astype(jnp.float32), axis=-1)
    no_speech_prob = (
        jnp.exp(step0[:, no_speech_id]) if no_speech_id is not None
        else jnp.zeros((B,), jnp.float32)
    )

    def pick(logp, key):
        if temperature <= 0.0:
            return jnp.argmax(logp, axis=-1).astype(jnp.int32)
        return jax.random.categorical(
            key, logp / temperature, axis=-1
        ).astype(jnp.int32)

    k0, rng = jax.random.split(rng)
    first = pick(step0, k0)
    first_lp = step0[jnp.arange(B), first]

    tokens = jnp.full((B, total), eot, jnp.int32)
    tokens = tokens.at[:, :P].set(prompt)
    tokens = tokens.at[:, P].set(first)
    finished = first == eot
    sum_lp = first_lp
    n_decoded = jnp.ones((B,), jnp.float32)

    if self_kv_int8:
        # one-shot int8 conversion of the primed cache; the barrier pins
        # it before the loop (same re-sinking hazard as the cross-KV
        # split above), and the bf16 cache dies here
        cache = jax.lax.optimization_barrier(
            quantize_self_cache(sk, sv, P))
    else:
        cache = (sk, sv)

    def cond(state):
        i, _, _, finished, _, _, _ = state
        return (i < total - 1) & ~jnp.all(finished)

    def body(state):
        i, tokens, cache, finished, sum_lp, n_decoded, rng = state
        cur = jax.lax.dynamic_slice(tokens, (0, i), (B, 1))
        logits, cache = decoder_step(
            params, dims, cur, cross_kv, i, cache, dtype=dtype,
            q8=decoder_q8, self_kv_int8=self_kv_int8,
        )
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        key, rng = jax.random.split(rng)
        nxt = pick(logp, key)
        nxt = jnp.where(finished, eot, nxt)
        lp = logp[jnp.arange(B), nxt]
        sum_lp = sum_lp + jnp.where(finished, 0.0, lp)
        n_decoded = n_decoded + jnp.where(finished, 0.0, 1.0)
        tokens = jax.lax.dynamic_update_slice(tokens, nxt[:, None], (0, i + 1))
        finished = finished | (nxt == eot)
        return i + 1, tokens, cache, finished, sum_lp, n_decoded, rng

    _, tokens, _, _, sum_lp, n_decoded, _ = jax.lax.while_loop(
        cond, body,
        (jnp.int32(P), tokens, cache, finished, sum_lp, n_decoded, rng),
    )
    return tokens, sum_lp / jnp.maximum(n_decoded, 1.0), no_speech_prob


N_LANGUAGES = 100  # multilingual whisper language-token block size

#: Whisper's language-token order (public; token id = lang_base + index).
#: large-v3 appends "yue" as index 99.
WHISPER_LANGUAGES: tuple[str, ...] = (
    "en", "zh", "de", "es", "ru", "ko", "fr", "ja", "pt", "tr", "pl",
    "ca", "nl", "ar", "sv", "it", "id", "hi", "fi", "vi", "he", "uk",
    "el", "ms", "cs", "ro", "da", "hu", "ta", "no", "th", "ur", "hr",
    "bg", "lt", "la", "mi", "ml", "cy", "sk", "te", "fa", "lv", "bn",
    "sr", "az", "sl", "kn", "et", "mk", "br", "eu", "is", "hy", "ne",
    "mn", "bs", "kk", "sq", "sw", "gl", "mr", "pa", "si", "km", "sn",
    "yo", "so", "af", "oc", "ka", "be", "tg", "sd", "gu", "am", "yi",
    "lo", "uz", "fo", "ht", "ps", "tk", "nn", "mt", "sa", "lb", "my",
    "bo", "tl", "mg", "as", "tt", "haw", "ln", "ha", "ba", "jw", "su",
    "yue",
)


def language_offset(code: str) -> int:
    """Language code → offset from ``lang_base`` (e.g. "en" → 0)."""
    try:
        return WHISPER_LANGUAGES.index(code.lower())
    except ValueError:
        raise ValueError(f"unknown whisper language code {code!r}") from None


def detect_language(
    params: Params,
    dims: WhisperDims,
    enc: jax.Array,  # (B, Ta, d)
    st: SpecialTokens,
    dtype: jnp.dtype = jnp.bfloat16,
) -> tuple[jax.Array, jax.Array]:
    """Language id + probability from one decoder step over <|sot|>.

    faster-whisper's detect_language: softmax over the language-token block
    of the first-step logits. Returns (lang_offset (B,), prob (B,)) where
    offset indexes from ``st.lang_base``.
    """
    B = enc.shape[0]
    ckv = precompute_cross_kv(params, dims, enc, dtype)
    sot = jnp.full((B, 1), st.sot, jnp.int32)
    logits, _, _ = decoder_forward(params, dims, sot, ckv, dtype=dtype)
    # language block ends where <|translate|> begins: 99 tokens on pre-v3
    # vocabs (51865), 100 on large-v3 — deriving from the token layout
    # keeps <|translate|> from being misread as a language on large-v2
    n_lang = st.translate - st.lang_base
    lang_logits = jax.lax.dynamic_slice_in_dim(
        logits[:, 0, :], st.lang_base, n_lang, axis=-1
    )
    probs = jax.nn.softmax(lang_logits.astype(jnp.float32), axis=-1)
    best = jnp.argmax(probs, axis=-1)
    return best, probs[jnp.arange(B), best]


def beam_decode(
    params: Params,
    dims: WhisperDims,
    enc: jax.Array,  # (B, Ta, d)
    prompt: jax.Array,  # (B, P)
    max_new_tokens: int,
    eot: int,
    beam_size: int = 5,
    length_penalty: float = 1.0,
    dtype: jnp.dtype = jnp.bfloat16,
    decoder_q8: Params | None = None,  # quantize_decoder_weights output
    cross_kv_quantize: bool = False,
    cross_kv_bits: int = 8,
    reorder: str | None = None,  # "onehot" | "kernel" | "lazy" | None=env
) -> jax.Array:
    """Beam search (faster-whisper's default strategy, beam_size=5).

    Hypotheses live as an extra batch dimension (B·K sequences decode as
    one batched program); self caches reorder by gather each step; the
    inner step is the same UNROLLED :func:`decoder_step` as greedy decode
    (the scan-over-layers form measured ~2× slower in a decode loop),
    with optional int8 weight matmuls and int8 cross KV.

    TPU-first memory/bandwidth design: the cross K/V is computed and
    stored for B rows, NOT B·K — all beams of a group attend to the same
    encoder states, so the K queries ride the M dimension of the
    cross-attention dot (``decoder_step(beams=K)``). This keeps the
    decode loop's dominant HBM term (re-reading cross KV every step) at
    GREEDY's cost, makes ``cross_kv_quantize`` fit single-chip HBM at
    window batch 16 × beam 5 (the old K-times-repeated layout did not),
    and prompt priming runs once per group instead of once per beam.
    The loop is a ``while_loop`` with an all-finished early exit, like
    greedy. Returns the best hypothesis per batch item, (B, P+max_new),
    EOT-padded.

    ``reorder`` picks the hypothesis-reorder strategy (default from the
    ``BEAM_REORDER`` env var, else ``"lazy"`` — the measured winner):

    * ``"lazy"`` (default) — NO physical reorder: caches live in
      (L, B, H, K, C, hd) BIRTH order and a (B, K, K, C) ancestry mask
      — permuted each step for pennies — routes each beam to its true
      history inside :func:`decoder_step`'s masked all-pairs
      self-attention. The physical reorder read+write it deletes was
      ~2/3 of beam's per-step self-cache HBM traffic; the price is a
      K× FLOP amplification of the (tiny) self-attention dots on the
      memory-bound MXU. Same-session A/B at beam-5 / window-batch-16 /
      ``cross_kv_int4``: RTF 0.0177 vs one-hot's 0.0287 (1.62×) —
      docs/bench_runs/asr_beam5_wb16_kvint4_{lazy,onehot_control}.json.
      Token output is exactly the one-hot path's (pinned in
      tests/unit/models/test_beam.py).
    * ``"onehot"`` — physically permute the (L, B·K, H, C, hd) caches
      each step with a 0/1 one-hot matmul (exact, rides the MXU; the
      measured winner among PHYSICAL reorders — see body comment).
    * ``"kernel"`` — Pallas DMA permute (measured slower; kept for
      reference).
    """
    import os

    mode = reorder or os.environ.get("BEAM_REORDER", "lazy")
    if mode not in ("onehot", "kernel", "lazy"):
        raise ValueError(f"unknown beam reorder mode {mode!r}")
    B, P = prompt.shape
    K = beam_size
    L, H = dims.n_text_layer, dims.n_text_head
    hd = dims.n_text_state // H
    total = P + max_new_tokens
    cache_len = min(dims.n_text_ctx, total)
    V = dims.n_vocab

    # cross KV over B rows only — beams share their group's KV
    cross_kv = precompute_cross_kv(params, dims, enc, dtype,
                                   quantize=cross_kv_quantize,
                                   bits=cross_kv_bits)

    # prime the self cache over B rows (the prompt is identical across
    # beams), then replicate it K× — priming compute is 1/K of the old
    # B·K-row teacher-forced pass
    sk = jnp.zeros((L, B, H, cache_len, hd), dtype)
    sv = jnp.zeros_like(sk)
    if cross_kv_quantize and P <= 16:
        # same split+barrier as greedy_decode: per-layer int8 buffers the
        # Pallas kernel can consume without Mosaic re-materialization;
        # unrolled priming keeps the stacked form from coexisting with
        # its split copies
        cross_kv = jax.lax.optimization_barrier(tuple(
            [part[layer] for layer in range(L)] for part in cross_kv
        ))
        logits = None
        for t in range(P):
            logits, (sk, sv) = decoder_step(
                params, dims, prompt[:, t:t + 1], cross_kv, t, (sk, sv),
                dtype=dtype, q8=decoder_q8,
            )
        logp0 = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    else:
        logits, (sk, sv), _ = decoder_forward(
            params, dims, prompt, cross_kv, 0, (sk, sv), dtype
        )
        logp0 = jax.nn.log_softmax(
            logits[:, -1, :].astype(jnp.float32), axis=-1)
        if cross_kv_quantize:
            # long-prompt guard path (see greedy_decode): split after the
            # teacher-forced priming; stacked + split briefly coexist
            cross_kv = jax.lax.optimization_barrier(tuple(
                [part[layer] for layer in range(L)] for part in cross_kv
            ))

    # initialize: top-K distinct first tokens per batch item
    top_lp, top_tok = jax.lax.top_k(logp0, K)  # (B, K)
    tokens = jnp.full((B, K, total), eot, jnp.int32)
    tokens = tokens.at[:, :, :P].set(prompt[:, None, :])
    tokens = tokens.at[:, :, P].set(top_tok)
    sum_lp = top_lp  # (B, K)
    finished = top_tok == eot

    if mode == "lazy":
        # caches in BIRTH order, (L, B, H, K, C, hd): primed prompt rows
        # sit at physical beam 0 (no K× replication — the ancestry mask
        # points every beam's prompt positions at row 0); k and c are
        # adjacent so the all-pairs attention dots need no big transpose
        skL = jnp.zeros((L, B, H, K, cache_len, hd), dtype)
        svL = jnp.zeros_like(skL)
        skL = skL.at[:, :, :, 0].set(sk)
        svL = svL.at[:, :, :, 0].set(sv)
        # ancestry mask (B, K_beam, K_row, C), bf16 0/1 so the per-step
        # permute is the same exact one-hot matmul trick at 1/5000th the
        # bytes of the cache reorder it replaces
        mask0 = jnp.zeros((B, K, K, cache_len), jnp.bfloat16)
        mask0 = mask0.at[:, :, 0, :P].set(1.0)
        ar = jnp.arange(K)

        def cond_l(state):
            i, _, _, finished, _, _, _ = state
            return (i < total - 1) & ~jnp.all(finished)

        def body_l(state):
            i, tokens, sum_lp, finished, skc, svc, mf = state
            cur = jax.lax.dynamic_slice(
                tokens.reshape(B * K, total), (0, i), (B * K, 1)
            )
            # the token decoded now lands at (row n, position i): each
            # beam owns its own physical row for its own new position
            mf = mf.at[:, ar, ar, i].set(1.0)
            logits, (skc, svc) = decoder_step(
                params, dims, cur, cross_kv, i, (skc, svc), dtype=dtype,
                q8=decoder_q8, beams=K, beam_mask=mf > 0,
            )
            logp = jax.nn.log_softmax(logits, axis=-1).reshape(B, K, V)
            eot_only = jnp.full((V,), -jnp.inf).at[eot].set(0.0)
            logp = jnp.where(finished[:, :, None],
                             eot_only[None, None, :], logp)
            cand = sum_lp[:, :, None] + logp
            new_lp, flat_idx = jax.lax.top_k(cand.reshape(B, K * V), K)
            src_beam = flat_idx // V
            new_tok = (flat_idx % V).astype(jnp.int32)
            gather = (jnp.arange(B)[:, None] * K + src_beam).reshape(-1)
            tokens = tokens.reshape(B * K, total)[gather].reshape(
                B, K, total)
            tokens = tokens.at[:, :, i + 1].set(new_tok)
            # hypothesis reorder = permute the MASK's beam axis, not the
            # caches: same one-hot-matmul exactness, ~180 KB not ~6 GB
            onehot = jax.nn.one_hot(src_beam, K, dtype=mf.dtype)
            mf = jnp.einsum("gns,gskc->gnkc", onehot, mf)
            finished = finished.reshape(B * K)[gather].reshape(B, K)
            finished = finished | (new_tok == eot)
            return i + 1, tokens, new_lp, finished, skc, svc, mf

        _, tokens, sum_lp, finished, _, _, _ = jax.lax.while_loop(
            cond_l, body_l,
            (jnp.int32(P), tokens, sum_lp, finished, skL, svL, mask0),
        )
        lengths = jnp.sum(
            (tokens != eot).astype(jnp.float32), axis=-1) - P + 1.0
        score = sum_lp / jnp.maximum(lengths, 1.0) ** length_penalty
        best = jnp.argmax(score, axis=-1)
        return tokens[jnp.arange(B), best]

    sk = jnp.repeat(sk, K, axis=1)  # (L, B*K, H, C, hd)
    sv = jnp.repeat(sv, K, axis=1)

    from audio_rag_tpu.ops.pallas_kernels import beam_reorder_kv, on_tpu
    # The DMA permute kernel is measured SLOWER than the one-hot matmul
    # at this (L, B·K, ...) layout (see beam_reorder_kv's lineage: the
    # per-row copy decomposes into L strided ~583 KB extents and the DMA
    # engine's fixed per-extent cost dominates). Opt-in only, kept for
    # the beam-outermost layout where rows are contiguous.
    use_permute_kernel = (
        mode == "kernel"
        and on_tpu(enc) and (H * cache_len * hd) % 128 == 0
    )

    def cond(state):
        i, _, _, finished, _, _ = state
        return (i < total - 1) & ~jnp.all(finished)

    def body(state):
        i, tokens, sum_lp, finished, sk, sv = state
        cur = jax.lax.dynamic_slice(
            tokens.reshape(B * K, total), (0, i), (B * K, 1)
        )
        logits, (sk_n, sv_n) = decoder_step(
            params, dims, cur, cross_kv, i, (sk, sv), dtype=dtype,
            q8=decoder_q8, beams=K,
        )
        logp = jax.nn.log_softmax(logits, axis=-1).reshape(B, K, V)
        # finished beams may only extend with EOT at no cost
        eot_only = jnp.full((V,), -jnp.inf).at[eot].set(0.0)
        logp = jnp.where(finished[:, :, None], eot_only[None, None, :], logp)

        cand = sum_lp[:, :, None] + logp  # (B, K, V)
        cand_flat = cand.reshape(B, K * V)
        new_lp, flat_idx = jax.lax.top_k(cand_flat, K)  # (B, K)
        src_beam = flat_idx // V  # (B, K)
        new_tok = (flat_idx % V).astype(jnp.int32)

        # reorder per-beam state by source beam. Measured lineage on the
        # (L, B*K, H, C, hd) caches (scripts/bench_beam_reorder.py): a
        # jnp row-axis gather scalarizes (40 ms/step, beam 7.2x greedy);
        # Pallas DMA permutes are extent-cost-bound at this layout
        # (~19 ms); the 0/1 one-hot MATMUL (T5X trick) rides the MXU at
        # 10.2 ms and is numerically exact — the production choice.
        gather = (jnp.arange(B)[:, None] * K + src_beam).reshape(-1)
        tokens = tokens.reshape(B * K, total)[gather].reshape(B, K, total)
        tokens = tokens.at[:, :, i + 1].set(new_tok)
        if use_permute_kernel:
            sk, sv = beam_reorder_kv(sk_n, sv_n, gather)
        else:
            onehot = jax.nn.one_hot(gather, B * K, dtype=sk_n.dtype)
            sk = jnp.einsum("nb,lbhcd->lnhcd", onehot, sk_n)
            sv = jnp.einsum("nb,lbhcd->lnhcd", onehot, sv_n)
        finished = finished.reshape(B * K)[gather].reshape(B, K)
        finished = finished | (new_tok == eot)
        return i + 1, tokens, new_lp, finished, sk, sv

    _, tokens, sum_lp, finished, _, _ = jax.lax.while_loop(
        cond, body,
        (jnp.int32(P), tokens, sum_lp, finished, sk, sv),
    )

    # pick best by length-normalized logprob
    lengths = jnp.sum((tokens != eot).astype(jnp.float32), axis=-1) - P + 1.0
    score = sum_lp / jnp.maximum(lengths, 1.0) ** length_penalty
    best = jnp.argmax(score, axis=-1)  # (B,)
    return tokens[jnp.arange(B), best]
