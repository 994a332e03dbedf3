"""Decoder-only LLM (llama-3.2-class) for answer synthesis, HyDE and
contextual chunk headers — replaces the external Ollama server the reference
calls over HTTP (``generation/ollama.py:79``, ``expansion/hyde.py:91``,
``contextual/processor.py:114``).

Architecture: RMSNorm pre-norm, RoPE, grouped-query attention, SwiGLU FFN,
tied or untied LM head. Functional params + scan-over-layers; decode is a
static-KV-cache ``lax.while_loop`` with greedy or temperature sampling.

Tensor-parallel sharding rules for the mesh's ``model`` axis live in
:func:`llm_param_spec` — attention heads and FFN hidden dim are split,
embeddings replicated (small models) or vocab-sharded (large).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from audio_rag_tpu.models.layers import (
    Params,
    apply_rope,
    embedding_init,
    linear,
    linear_init,
    linear_q8,
    make_causal_mask,
    mha_init,
    quantize_linear,
    quantize_linear_q4,
    rms_norm,
    rms_norm_init,
    rope_frequencies,
    swiglu,
    swiglu_init,
)

__all__ = [
    "LLMDims",
    "LLM_PRESETS",
    "init_llm",
    "llm_forward",
    "llm_generate",
    "llm_param_spec",
    "llm_prefill_slots",
    "llm_decode_slots",
    "llm_decode_slots_spec",
    "llm_block_verify",
    "llm_speculative_generate",
]


@dataclasses.dataclass(frozen=True)
class LLMDims:
    vocab: int
    d_model: int
    n_heads: int
    n_kv_heads: int
    n_layers: int
    d_ff: int
    max_len: int
    rope_theta: float = 500000.0


LLM_PRESETS: dict[str, LLMDims] = {
    "llama-3.2-1b": LLMDims(128256, 2048, 32, 8, 16, 8192, 8192),
    "llama-3.2-3b": LLMDims(128256, 3072, 24, 8, 28, 8192, 8192),
    "test": LLMDims(512, 64, 4, 2, 2, 128, 128, rope_theta=10000.0),
    # the committed TRAINED tiny generator (scripts/train_llm.py):
    # hash-word vocab, trained on RAG answers / HyDE passages / judge
    # verdicts over the synthetic corpus — real EOS termination and
    # grounded echo behavior for the answer path, HyDE, the faithfulness
    # judge, and speculative-decode acceptance measurement. The
    # reference's equivalent is a downloaded ollama llama3.2
    # (generation/ollama.py:58-96).
    "eval-small": LLMDims(2048, 256, 8, 4, 4, 1024, 1024,
                          rope_theta=10000.0),
}


def init_llm(
    key: jax.Array,
    dims: LLMDims,
    storage_dtype: jnp.dtype | None = None,
) -> Params:
    """Random-init parameter tree (checkpoint loading overwrites in place).

    storage_dtype: when set (e.g. ``jnp.bfloat16``) the per-layer blocks are
    generated inside a ``lax.scan`` and cast before landing in the
    pre-allocated stacked output buffer, so fp32 exists one layer at a time.
    The eager list-then-``jnp.stack`` path peaks at ~2x the fp32 param bytes
    (~26 GB for llama-3.2-3b) and OOMs a 16 GB chip; the scan path peaks at
    bf16-total + one fp32 layer. Values match casting the default path's
    output to within 1 bf16 ULP (same key splits; XLA may fuse scale
    multiplies into the cast, double-rounding boundary cases).
    """
    k_emb, k_blocks, k_out = jax.random.split(key, 3)

    def one_block(k: jax.Array) -> Params:
        ka, km = jax.random.split(k)
        return {
            "ln_attn": rms_norm_init(dims.d_model),
            "attn": mha_init(
                ka, dims.d_model, dims.n_heads,
                n_kv_heads=dims.n_kv_heads, bias=False,
            ),
            "ln_mlp": rms_norm_init(dims.d_model),
            "mlp": swiglu_init(km, dims.d_model, dims.d_ff),
        }

    keys = jax.random.split(k_blocks, dims.n_layers)
    if storage_dtype is None:
        cast = lambda t: t  # noqa: E731
        blocks = jax.tree.map(
            lambda *xs: jnp.stack(xs), *[one_block(k) for k in keys]
        )
    else:
        # mirror engine.bf16_storage: cast fp32 leaves only
        cast = lambda t: jax.tree.map(  # noqa: E731
            lambda x: x.astype(storage_dtype)
            if x.dtype == jnp.float32 else x, t,
        )
        _, blocks = jax.lax.scan(
            lambda _, k: (None, cast(one_block(k))), None, keys
        )
    return {
        "tok_emb": cast(embedding_init(k_emb, dims.vocab, dims.d_model)),
        "blocks": blocks,
        "ln_f": cast(rms_norm_init(dims.d_model)),
        "lm_head": cast(
            linear_init(k_out, dims.d_model, dims.vocab, bias=False)
        ),
    }


def llm_param_spec(dims: LLMDims) -> Params:
    """PartitionSpec tree for tensor parallelism over the ``model`` axis.

    Column-split QKV/gate/up (output features), row-split O/down (input
    features) — the Megatron layout, so each block needs one psum, emitted
    by XLA from these annotations.
    """
    col = P(None, None, "model")  # stacked (L, d_in, d_out): split d_out
    row = P(None, "model", None)  # split d_in
    return {
        "tok_emb": {"table": P(None, None)},
        "blocks": {
            "ln_attn": {"g": P(None, None)},
            "attn": {
                "q": {"w": col},
                "k": {"w": col},
                "v": {"w": col},
                "o": {"w": row},
            },
            "ln_mlp": {"g": P(None, None)},
            "mlp": {
                "gate": {"w": col},
                "up": {"w": col},
                "down": {"w": row},
            },
        },
        "ln_f": {"g": P(None)},
        "lm_head": {"w": P(None, "model")},
    }


def _attn_block(
    p: Params,
    x: jax.Array,
    dims: LLMDims,
    cos: jax.Array,
    sin: jax.Array,
    mask: jax.Array,
    cache: tuple[jax.Array, jax.Array] | None,
    cache_index,
    dtype: jnp.dtype,
) -> tuple[jax.Array, tuple[jax.Array, jax.Array] | None]:
    B, T, d = x.shape
    H, HKV = dims.n_heads, dims.n_kv_heads
    hd = d // H
    xn = rms_norm(p["ln_attn"], x)
    q = linear(p["attn"]["q"], xn, dtype).reshape(B, T, H, hd).transpose(0, 2, 1, 3)
    k = linear(p["attn"]["k"], xn, dtype).reshape(B, T, HKV, hd).transpose(0, 2, 1, 3)
    v = linear(p["attn"]["v"], xn, dtype).reshape(B, T, HKV, hd).transpose(0, 2, 1, 3)
    q = apply_rope(q, cos, sin)
    k = apply_rope(k, cos, sin)

    new_cache = None
    if cache is not None:
        ck, cv = cache
        ck = jax.lax.dynamic_update_slice(ck, k.astype(ck.dtype), (0, 0, cache_index, 0))
        cv = jax.lax.dynamic_update_slice(cv, v.astype(cv.dtype), (0, 0, cache_index, 0))
        k, v = ck, cv
        new_cache = (ck, cv)

    k = jnp.repeat(k, H // HKV, axis=1)
    v = jnp.repeat(v, H // HKV, axis=1)
    scale = hd ** -0.5
    logits = jnp.einsum("bhqd,bhkd->bhqk", q * scale, k,
                        preferred_element_type=jnp.float32)
    logits = jnp.where(mask, logits, -1e30)
    probs = jax.nn.softmax(logits, axis=-1).astype(dtype)
    o = jnp.einsum("bhqk,bhkd->bhqd", probs, v,
                   preferred_element_type=jnp.float32).astype(dtype)
    o = o.transpose(0, 2, 1, 3).reshape(B, T, d)
    return x + linear(p["attn"]["o"], o, dtype), new_cache


def llm_forward(
    params: Params,
    dims: LLMDims,
    tokens: jax.Array,  # (B, T)
    pos_offset=0,
    cache: tuple[jax.Array, jax.Array] | None = None,  # (L, B, HKV, C, hd) ×2
    dtype: jnp.dtype = jnp.bfloat16,
    kv_valid: jax.Array | None = None,  # (B, C or T) bool, False = pad slot
    pos_ids: jax.Array | None = None,  # (B, T) TRUE rope positions per row
    last_pos: jax.Array | None = None,  # (B,) per-row position to project
) -> tuple[jax.Array, tuple[jax.Array, jax.Array] | None]:
    """Returns (logits (B, T, vocab) fp32, updated cache).

    ``kv_valid`` masks left-padded prompt positions out of attention
    (needed for batched generation over unequal-length prompts).
    ``pos_ids`` gives each row its TRUE positions for rope — HF llama
    numbers positions from each sequence's first real token, not from the
    padded frame (transformers derives position_ids from the attention
    mask); frame-indexed rope is only a uniform phase shift (harmless
    mathematically) but diverges in bf16 rounding from both HF and the
    continuous-batching path.

    ``last_pos`` restricts the lm_head projection to ONE position per row
    (returned as logits (B, 1, vocab)): generation prefills only consume
    the last valid position, and the full-sequence projection is
    catastrophic at scale — (16, 1024, 128256) fp32 logits are 8.4 GB, a
    measured OOM next to llama-3.2-3b's 10.4 GB residency when the
    contextual header batch prefilled 16 prompts. Training/parity callers
    leave it None and get the full (B, T, vocab)."""
    B, T = tokens.shape
    hd = dims.d_model // dims.n_heads
    cos_t, sin_t = _rope_tables(dims, hd)
    if pos_ids is not None:
        cos = cos_t[pos_ids][:, None]  # (B, 1, T, hd/2)
        sin = sin_t[pos_ids][:, None]
    else:
        cos = jax.lax.dynamic_slice_in_dim(cos_t, pos_offset, T, axis=0)
        sin = jax.lax.dynamic_slice_in_dim(sin_t, pos_offset, T, axis=0)

    x = params["tok_emb"]["table"].astype(dtype)[tokens]

    if cache is not None:
        C = cache[0].shape[3]
        mask = make_causal_mask(T, C, offset=pos_offset)
        mask = mask & (jnp.arange(C)[None, :] < pos_offset + T)
    else:
        mask = make_causal_mask(T, T)
    if kv_valid is not None:
        # (B, 1, 1, C/T) broadcast against (T, C/T)
        mask = mask[None, None] & kv_valid[:, None, None, :]

    def block(carry, layer):
        x = carry
        p, lk, lv = layer
        c = (lk, lv) if cache is not None else None
        x, new_c = _attn_block(
            p, x, dims, cos, sin, mask, c,
            pos_offset if cache is not None else None, dtype,
        )
        x = x + swiglu(p["mlp"], rms_norm(p["ln_mlp"], x), dtype)
        out_c = new_c if new_c is not None else (lk, lv)
        return x, out_c

    if cache is not None:
        lk, lv = cache
    else:
        lk = jnp.zeros((dims.n_layers, B, dims.n_kv_heads, 1, hd), dtype)
        lv = lk
    x, (nk, nv) = jax.lax.scan(block, x, (params["blocks"], lk, lv))
    x = rms_norm(params["ln_f"], x)
    if last_pos is not None:
        x = x[jnp.arange(B), last_pos][:, None, :]  # (B, 1, d)
    logits = linear(params["lm_head"], x, dtype).astype(jnp.float32)
    return logits, ((nk, nv) if cache is not None else None)


# cache NUMPY tables, converting at trace time: a cached jax.Array captured
# as a jit closure constant degrades all subsequent dispatches (see
# ops/similarity.py NEG_INF note)
_ROPE_CACHE: dict[tuple, tuple[np.ndarray, np.ndarray]] = {}


def _rope_tables(dims: LLMDims, head_dim: int):
    key = (dims.max_len, head_dim, dims.rope_theta)
    if key not in _ROPE_CACHE:
        _ROPE_CACHE[key] = rope_frequencies(
            head_dim, dims.max_len, dims.rope_theta
        )
    cos, sin = _ROPE_CACHE[key]
    return jnp.asarray(cos), jnp.asarray(sin)


def quantize_llm_weights(params: Params, dims: LLMDims,
                         bits: int = 8,
                         lm_head_bits: int | None = None) -> Params:
    """Per-out-channel int8 (``bits=8``) or group-wise int4 (``bits=4``)
    of every weight matrix the decode loop re-reads each token (attention
    + swiglu linears and the lm_head — ≈2.5 GB/step bf16 on
    llama-3.2-1b, with the 128k-vocab head alone 0.5 GB). int4 halves the
    int8 bytes again — the same weight regime the reference serves
    through ollama (Q4_K_M) — with Q4_0/GPTQ-class group scales
    (:func:`~audio_rag_tpu.models.layers.quantize_linear_q4`).

    Per-layer lists, not stacked: XLA re-sinks "free" slices of stacked
    arrays into the loop body and Mosaic then re-materializes the Pallas
    operand every token (see whisper's greedy_decode barrier note).
    :func:`linear_q8` dequantizes tiles to bf16 in VMEM.

    Q/K/V and gate/up are FUSED into single (d, d+2·kv)/(d, 2·ff)
    matrices: the decode step is launch-bound (7 small Pallas calls per
    layer × n_layers each pay a fixed dispatch/pipeline cost that dwarfs
    their HBM read at M=16 rows), and fusing cuts the launches per layer
    from 7 to 4. Per-column quantization (out-channel for int8, (group,
    out-channel) for int4 — both span only the dout axis within one din)
    makes the fused matmul bitwise identical to the split ones — each
    output column sees the same quantized weights, scales, and f32
    accumulation order over din — so this concatenates the
    individually-quantized matrices.

    ``lm_head_bits`` overrides ``bits`` for the vocab projection only —
    the MIXED profile the on-chip per-matmul table supports
    (docs/PERFORMANCE.md "int4 decode paths"): int4's in-VMEM unpack
    loses to int8 at every decode matmul shape EXCEPT the very wide
    vocab projection (dout≈128k amortizes it), and the 128k-row head is
    ~22 % of llama-3.2-1b's weight bytes. ``linear_q8`` dispatches per
    matrix by key (``w8``/``w4``), so mixing needs no decode-path
    changes.
    """
    if bits not in (8, 4):
        raise ValueError(f"bits must be 8 or 4, got {bits}")
    lm_bits = lm_head_bits if lm_head_bits is not None else bits
    if lm_bits not in (8, 4):
        raise ValueError(f"lm_head_bits must be 8 or 4, got {lm_bits}")
    quant = quantize_linear if bits == 8 else quantize_linear_q4
    wkey = "w8" if bits == 8 else "w4"
    saxis = 0 if bits == 8 else 1  # int8: (dout,); int4: (din/G, dout)

    def q(p):
        return quant(p["w"])

    def qcat(*ps):
        qs = [quant(p["w"]) for p in ps]
        return {wkey: jnp.concatenate([e[wkey] for e in qs], axis=1),
                "s": jnp.concatenate([e["s"] for e in qs], axis=saxis)}

    blocks = []
    for layer in range(dims.n_layers):
        p = jax.tree.map(lambda a: a[layer], params["blocks"])
        blocks.append({
            "attn_qkv": qcat(p["attn"]["q"], p["attn"]["k"],
                             p["attn"]["v"]),
            "attn_o": q(p["attn"]["o"]),
            "mlp_gateup": qcat(p["mlp"]["gate"], p["mlp"]["up"]),
            "mlp_down": q(p["mlp"]["down"]),
        })
    head_quant = quantize_linear if lm_bits == 8 else quantize_linear_q4
    return {"blocks": blocks, "lm_head": head_quant(params["lm_head"]["w"])}


def q8_param_bytes(dims: LLMDims, bits: int = 8,
                   lm_head_bits: int | None = None) -> int:
    """HBM bytes of the :func:`quantize_llm_weights` copies (int8/int4
    weights + fp32 scales: per-out-channel at 8 bits, per-(din-group,
    out-channel) at 4). They coexist with the bf16 params, so generator
    backends add this to hbm_required_gb when ``decoder_int8``/``_int4``
    is on (~1.2 GB for llama-3.2-1b int8, ~0.7 GB int4)."""
    def bytes_for(mats, b):
        w = sum(din * dout for din, dout in mats)
        if b == 8:
            return w + 4 * sum(dout for _, dout in mats)
        from audio_rag_tpu.ops.pallas_kernels import q4_group

        scales = sum((din // q4_group(din)) * dout for din, dout in mats)
        return w // 2 + 4 * scales

    d = dims.d_model
    kv_d = dims.n_kv_heads * (d // dims.n_heads)
    block_mats = [(d, d + 2 * kv_d), (d, d), (d, 2 * dims.d_ff),
                  (dims.d_ff, d)] * dims.n_layers
    lm_bits = lm_head_bits if lm_head_bits is not None else bits
    return bytes_for(block_mats, bits) + \
        bytes_for([(d, dims.vocab)], lm_bits)


def llm_decode_step(
    params: Params,
    dims: LLMDims,
    tok: jax.Array,  # (B,) int32 — each row's current token
    pos: jax.Array,  # () or (B,) int32 — KV write index / mask bound;
    # a SCALAR means all rows share the frame position (wave decode)
    cache_k: jax.Array,  # (L, B, HKV, C, hd)
    cache_v: jax.Array,
    kv_valid: jax.Array | None = None,  # (B, C) bool
    dtype: jnp.dtype = jnp.bfloat16,
    rope_pos: jax.Array | None = None,  # () or (B,) TRUE positions (≠ pos
    # when the cache frame is left-padded); defaults to pos
    q8: Params | None = None,  # quantize_llm_weights output
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """One incremental decode step with the layer loop UNROLLED.

    Same finding as whisper's ``decoder_step``: a ``lax.scan`` over layers
    inside the decode loop runs ~2× slower than the unrolled form (the
    scan's per-layer slicing of the stacked KV cache doesn't stay in
    place). Measured on the LLM: wave decode was 16.7 ms/step for
    llama-3.2-1b at batch 8 — ~5× off bf16 memory theory — before this.

    Positions may be PER ROW so this one function serves both the wave
    path (all rows share a position) and the continuous-batching slots
    (each slot at its own position) — sharing the exact step math keeps
    the two paths bit-identical, which the continuous-vs-wave parity
    test pins. Wave callers pass a SCALAR ``pos``: the KV write then
    lowers to ``dynamic_update_slice`` (in place, like whisper's
    decoder_step), where the per-row form is a scatter whose functional
    update XLA re-materializes — measured ~38 ms/token on llama-3.2-3b
    B=1 against ~5.4 ms for the same step with the scatter dead.
    Returns (last-token logits (B, vocab) fp32, cache_k, cache_v).
    """
    L, B, HKV, C, hd = cache_k.shape
    H = dims.n_heads
    uniform = pos.ndim == 0
    cos_t, sin_t = _rope_tables(dims, hd)
    rp = pos if rope_pos is None else rope_pos
    if rp.ndim == 0:
        cos = cos_t[rp][None, None, None, :]  # (1, 1, 1, hd/2)
        sin = sin_t[rp][None, None, None, :]
    else:
        cos = cos_t[rp][:, None, None, :]  # (B, 1, 1, hd/2)
        sin = sin_t[rp][:, None, None, :]
    x = params["tok_emb"]["table"].astype(dtype)[tok][:, None, :]  # (B,1,d)
    if uniform:
        mask = (jnp.arange(C) <= pos)[None, None, None, :]  # (1,1,1,C)
    else:
        mask = (jnp.arange(C)[None, :] <= pos[:, None])[:, None, None, :]
    if kv_valid is not None:
        mask = mask & kv_valid[:, None, None, :]
    scale = hd ** -0.5
    b_idx = jnp.arange(B)

    G = H // HKV
    kv_d = HKV * hd
    for layer in range(dims.n_layers):
        p = jax.tree.map(lambda a: a[layer], params["blocks"])
        p8 = None if q8 is None else q8["blocks"][layer]

        xn = rms_norm(p["ln_attn"], x)
        if p8 is None:
            q = linear(p["attn"]["q"], xn, dtype)
            k = linear(p["attn"]["k"], xn, dtype)
            v = linear(p["attn"]["v"], xn, dtype)
        else:
            # fused QKV: one Pallas launch; output columns are bitwise
            # identical to the split matmuls (per-out-channel quant)
            qkv = linear_q8({}, p8["attn_qkv"], xn, dtype)
            q = qkv[..., :dims.d_model]
            k = qkv[..., dims.d_model:dims.d_model + kv_d]
            v = qkv[..., dims.d_model + kv_d:]
        q = q.reshape(B, 1, H, hd).transpose(0, 2, 1, 3)
        k = k.reshape(B, 1, HKV, hd).transpose(0, 2, 1, 3)
        v = v.reshape(B, 1, HKV, hd).transpose(0, 2, 1, 3)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)
        if uniform:
            # all rows write the same frame: static layer index + scalar
            # position dynamic_update_slice — XLA keeps the stacked cache
            # in place (whisper decoder_step's measured pattern)
            cache_k = jax.lax.dynamic_update_slice(
                cache_k, k[None].astype(cache_k.dtype),
                (layer, 0, 0, pos, 0))
            cache_v = jax.lax.dynamic_update_slice(
                cache_v, v[None].astype(cache_v.dtype),
                (layer, 0, 0, pos, 0))
        else:
            # static layer index, per-row scatter at each row's position
            cache_k = cache_k.at[layer, b_idx[:, None],
                                 jnp.arange(HKV)[None, :],
                                 pos[:, None], :].set(
                k[:, :, 0, :].astype(cache_k.dtype))
            cache_v = cache_v.at[layer, b_idx[:, None],
                                 jnp.arange(HKV)[None, :],
                                 pos[:, None], :].set(
                v[:, :, 0, :].astype(cache_v.dtype))
        # grouped-query attention WITHOUT materializing the repeated
        # cache: query head h reads kv head h//G, so the G query heads of
        # each kv head ride the dot's M dimension (same contraction as
        # the jnp.repeat form — bitwise identical, no (B, H, C, hd) copy)
        kk = cache_k[layer].astype(dtype)  # (B, HKV, C, hd)
        vv = cache_v[layer].astype(dtype)
        qg = (q * scale).reshape(B, HKV, G, hd)
        s = jnp.einsum("bhgd,bhkd->bhgk", qg, kk,
                       preferred_element_type=jnp.float32)
        s = jnp.where(mask, s, -1e30)
        probs = jax.nn.softmax(s, axis=-1).astype(dtype)
        o = jnp.einsum("bhgk,bhkd->bhgd", probs, vv,
                       preferred_element_type=jnp.float32).astype(dtype)
        o = o.reshape(B, 1, dims.d_model)
        if p8 is None:
            x = x + linear(p["attn"]["o"], o, dtype)
            xm = rms_norm(p["ln_mlp"], x)
            x = x + swiglu(p["mlp"], xm, dtype)
        else:
            x = x + linear_q8(p["attn"]["o"], p8["attn_o"], o, dtype)
            xm = rms_norm(p["ln_mlp"], x)
            gu = linear_q8({}, p8["mlp_gateup"], xm, dtype)
            gate, up = gu[..., :dims.d_ff], gu[..., dims.d_ff:]
            x = x + linear_q8(p["mlp"]["down"], p8["mlp_down"],
                              jax.nn.silu(gate) * up, dtype)

    x = rms_norm(params["ln_f"], x)
    if q8 is None:
        logits = linear(params["lm_head"], x, dtype)[:, 0].astype(
            jnp.float32)
    else:
        logits = linear_q8(params["lm_head"], q8["lm_head"], x,
                           dtype=jnp.float32)[:, 0]
    return logits, cache_k, cache_v


def llm_prefill_slots(
    params: Params,
    dims: LLMDims,
    prompts: jax.Array,  # (R, Pb) int32, right-padded
    n_valid: jax.Array,  # (R,) int32: true prompt lengths
    cache_k: jax.Array,  # (L, B, HKV, C, hd)
    cache_v: jax.Array,
    slots: jax.Array,  # (R,) int32 — target batch slot per row
    temps: jax.Array,  # (R,) f32 — per-row temperature (<=0 greedy)
    rng: jax.Array,
    dtype: jnp.dtype = jnp.bfloat16,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Prefill R requests' KV into their batch slots in ONE dispatch
    (continuous-batching admission) and pick each row's FIRST generated
    token on device. Returns (cache_k, cache_v, first_tokens (R,)).

    Batched admission is a dispatch-floor optimization: this runtime
    charges a flat ~28 ms per host↔device interaction, and the previous
    one-prefill-per-request admission paid it R times plus an (R × vocab)
    logits readback each — measured 590 ms of a 1.0 s continuous-batching
    workload. One dispatch + one (R,) int32 readback amortizes admission
    to a constant.

    Prompts are RIGHT-padded: garbage KV rows in [n_valid, Pb) are masked
    out by the decoder's per-slot position mask and progressively
    overwritten by generated tokens. Duplicate rows targeting the same
    slot are allowed (the batcher pads R up to a pow-2 bucket by
    repeating row 0): they write identical KV, so write order between
    them is irrelevant.
    """
    L, B, HKV, C, hd = cache_k.shape
    R, Pb = prompts.shape
    sk = jnp.zeros((L, R, HKV, Pb, hd), dtype)
    sv = jnp.zeros_like(sk)
    kv_valid = jnp.arange(Pb)[None, :] < n_valid[:, None]
    logits, (sk, sv) = llm_forward(
        params, dims, prompts, 0, (sk, sv), dtype, kv_valid=kv_valid,
        # project only each row's last REAL position (right-padded): the
        # full (R, Pb, 128k-vocab) fp32 logits would be ~0.5-1 GB per
        # admission for nothing (see llm_forward last_pos docstring)
        last_pos=(n_valid - 1).astype(jnp.int32),
    )
    # per-row dynamic_update_slice chain (R is static, ≤ n_slots): each
    # write is an in-place slice update; the equivalent one-shot scatter
    # measured 6× slower standalone (see llm_decode_step's write note)
    for r in range(R):
        cache_k = jax.lax.dynamic_update_slice(
            cache_k,
            jax.lax.dynamic_slice_in_dim(sk, r, 1, axis=1).astype(
                cache_k.dtype),
            (0, slots[r], 0, 0, 0))
        cache_v = jax.lax.dynamic_update_slice(
            cache_v,
            jax.lax.dynamic_slice_in_dim(sv, r, 1, axis=1).astype(
                cache_v.dtype),
            (0, slots[r], 0, 0, 0))
    lg = logits[:, 0, :]  # (R, vocab) fp32
    safe_t = jnp.where(temps > 0, temps, 1.0)
    sampled = jax.random.categorical(
        rng, lg / safe_t[:, None], axis=-1).astype(jnp.int32)
    greedy = jnp.argmax(lg, axis=-1).astype(jnp.int32)
    first = jnp.where(temps > 0, sampled, greedy)
    return cache_k, cache_v, first


def llm_decode_slots(
    params: Params,
    dims: LLMDims,
    last_tok: jax.Array,  # (B,) int32 — each slot's most recent token
    cache_k: jax.Array,  # (L, B, HKV, C, hd)
    cache_v: jax.Array,
    pos: jax.Array,  # (B,) int32 — index where last_tok's KV will be written
    active: jax.Array,  # (B,) bool — slot holds a live request
    temps: jax.Array,  # (B,) f32 — per-slot temperature (<=0 greedy)
    rng: jax.Array,
    n_steps: int,
    eos_id: int,
    dtype: jnp.dtype = jnp.bfloat16,
    q8: Params | None = None,  # quantize_llm_weights output
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array, jax.Array]:
    """``n_steps`` decode steps for every slot with PER-SLOT positions —
    the continuous-batching inner loop. Requests join/leave only at
    segment boundaries: on this runtime each dispatch carries a flat
    ~28 ms cost, so per-token admission would pay that floor per token;
    an n_steps-token segment amortizes it while bounding head-of-line
    latency to one segment.

    Returns (tokens (B, n_steps), cache_k, cache_v, new_pos, finished).
    """
    def one_step(carry, _):
        last, ck_all, cv_all, pos, finished, rng = carry
        # the SHARED unrolled decode step (bit-identical to the wave path)
        logits, ck_all, cv_all = llm_decode_step(
            params, dims, last, pos, ck_all, cv_all, dtype=dtype, q8=q8,
        )

        key, rng = jax.random.split(rng)
        safe_t = jnp.where(temps > 0, temps, 1.0)
        sampled = jax.random.categorical(key, logits / safe_t[:, None],
                                         axis=-1).astype(jnp.int32)
        greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        nxt = jnp.where(temps > 0, sampled, greedy)
        run = active & ~finished
        nxt = jnp.where(run, nxt, eos_id)
        finished = finished | (run & (nxt == eos_id)) | ~active
        pos = pos + run.astype(jnp.int32)
        return (nxt, ck_all, cv_all, pos, finished, rng), nxt

    finished0 = ~active
    (last, cache_k, cache_v, pos, finished, _), toks = jax.lax.scan(
        one_step,
        (last_tok, cache_k, cache_v, pos, finished0, rng),
        None, length=n_steps,
    )
    return toks.T, cache_k, cache_v, pos, finished


def llm_decode_slots_spec(
    params: Params,
    dims: LLMDims,
    history: jax.Array,  # (B, Hh) int32 — recent tokens, RIGHT-aligned,
    #                      left-padded with -1; column Hh-1 = last token
    cache_k: jax.Array,  # (L, B, HKV, C, hd)
    cache_v: jax.Array,
    pos: jax.Array,  # (B,) int32 — KV write index == true position
    active: jax.Array,  # (B,) bool
    temps: jax.Array,  # (B,) f32 — per-slot temperature (<=0 greedy)
    rng: jax.Array,
    n_steps: int,
    eos_id: int,
    spec_k: int = 4,
    dtype: jnp.dtype = jnp.bfloat16,
    q8: Params | None = None,
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array, jax.Array]:
    """Speculative variant of :func:`llm_decode_slots` — same contract
    (each active row emits exactly ``n_steps`` tokens unless it EOSes),
    but greedy rows advance by n-gram-drafted blocks verified in ONE
    :func:`llm_block_verify` pass per iteration, reading the decode-loop
    weights once per accepted run instead of once per token.

    ``history`` is what makes drafting work in continuous batching: the
    prompt lives host-side between segments, and prompt-lookup drafting
    copies spans from it (RAG answers quote their context verbatim — the
    n-gram drafter's best case). The batcher ships each slot's recent
    prompt+output tail, right-aligned; -1 padding can never match a real
    2-gram.

    Sampling rows (``temps > 0``) accept exactly one token per iteration
    (sampled from the block's first-position logits) — speculative
    acceptance is only exact for greedy — so a mixed batch degrades to
    the plain path's step count for those rows while greedy rows still
    skip ahead. Greedy rows' output is EXACTLY the plain path's.
    """
    from audio_rag_tpu.models.whisper import ngram_draft

    L, B, HKV, C, hd = cache_k.shape
    k = spec_k
    W = history.shape[1] + n_steps + k
    work = jnp.concatenate(
        [history, jnp.full((B, n_steps + k), -1, jnp.int32)], axis=1)
    out = jnp.full((B, n_steps), eos_id, jnp.int32)
    n_tok = jnp.full((B,), history.shape[1] - 1, jnp.int32)
    n_out = jnp.zeros((B,), jnp.int32)
    finished = ~active
    b_idx = jnp.arange(B)
    greedy_row = temps <= 0
    safe_t = jnp.where(temps > 0, temps, 1.0)

    def cond(state):
        _, _, _, n_out, _, _, _, finished, _ = state
        return ~jnp.all(finished | (n_out >= n_steps))

    def body(state):
        work, out, n_tok, n_out, pos, ck, cv, finished, rng = state
        cur = work[b_idx, n_tok]  # (B,)
        drafts = ngram_draft(work, n_tok, k - 1)  # (B, k-1)
        block = jnp.concatenate([cur[:, None], drafts], axis=1)  # (B, k)
        logits, ck, cv = llm_block_verify(
            params, dims, block, pos, ck, cv, dtype=dtype, q8=q8,
        )
        f = jnp.argmax(logits, axis=-1).astype(jnp.int32)  # (B, k)
        key, rng = jax.random.split(rng)
        sampled0 = jax.random.categorical(
            key, logits[:, 0, :] / safe_t[:, None], axis=-1
        ).astype(jnp.int32)
        emit = f.at[:, 0].set(jnp.where(greedy_row, f[:, 0], sampled0))

        match = block[:, 1:] == f[:, :-1]  # (B, k-1)
        a = jnp.sum(jnp.cumprod(match.astype(jnp.int32), axis=1), axis=1)
        a = jnp.where(greedy_row, a, 0)  # sampling: 1 token/iteration
        eos_pos = jnp.argmax(emit == eos_id, axis=1)
        has_eos = jnp.any(emit == eos_id, axis=1)
        a = jnp.where(has_eos, jnp.minimum(a, eos_pos), a)
        a = jnp.minimum(a, n_steps - 1 - n_out)  # segment quota
        a = jnp.minimum(a, C - 2 - pos)  # cache bound (see cpos clip)

        j_grid = jnp.arange(k)[None, :]
        write = (j_grid <= a[:, None]) & ~finished[:, None]  # (B, k)
        dst_o = n_out[:, None] + j_grid  # unclipped + mode="drop"
        old_o = jnp.take_along_axis(
            out, jnp.clip(dst_o, 0, n_steps - 1), axis=1)
        out = out.at[b_idx[:, None], dst_o].set(
            jnp.where(write, emit, old_o), mode="drop")
        dst_w = n_tok[:, None] + 1 + j_grid
        old_w = jnp.take_along_axis(work, jnp.clip(dst_w, 0, W - 1), axis=1)
        work = work.at[b_idx[:, None], dst_w].set(
            jnp.where(write, emit, old_w), mode="drop")

        n_new = jnp.where(finished, 0, a + 1)
        n_tok = n_tok + n_new
        n_out = n_out + n_new
        pos = pos + n_new
        emitted_eos = jnp.any((emit == eos_id) & write, axis=1)
        finished = finished | emitted_eos | (pos >= C - 2)
        return work, out, n_tok, n_out, pos, ck, cv, finished, rng

    (_, out, _, _, pos, cache_k, cache_v, finished, _) = jax.lax.while_loop(
        cond, body,
        (work, out, n_tok, n_out, pos, cache_k, cache_v, finished, rng),
    )
    return out, cache_k, cache_v, pos, finished


def llm_block_verify(
    params: Params,
    dims: LLMDims,
    block: jax.Array,  # (B, k) int32 — [cur, draft_1..draft_{k-1}]
    pos: jax.Array,  # (B,) int32 — per-row KV write index of block[:, 0]
    cache_k: jax.Array,  # (L, B, HKV, C, hd)
    cache_v: jax.Array,
    kv_valid: jax.Array | None = None,  # (B, C) bool, False = pad slot
    rope_pos: jax.Array | None = None,  # (B,) TRUE position of block[:, 0]
    dtype: jnp.dtype = jnp.bfloat16,
    q8: Params | None = None,  # quantize_llm_weights output
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Teacher-forced k-token step with PER-ROW positions — the verify
    pass of speculative decoding (the LLM twin of whisper's
    ``decoder_block_verify``, models/whisper.py).

    One invocation consumes a k-token block per row: the decode-loop
    weights (attention/SwiGLU linears + the 128k-vocab lm_head — the
    memory-bound term at ≈2.5 GB/step bf16 on llama-3.2-1b) are read ONCE
    for k tokens instead of once per token; the k queries ride the
    attention dot's M dimension. Per-row positions let each batch row
    advance by its own acceptance count. Layer loop UNROLLED like
    :func:`llm_decode_step` (a scan measured ~2× slower in decode loops).
    Returns (logits (B, k, vocab) fp32, cache_k, cache_v).
    """
    L, B, HKV, C, hd = cache_k.shape
    H = dims.n_heads
    k = block.shape[1]
    cos_t, sin_t = _rope_tables(dims, hd)
    rp0 = pos if rope_pos is None else rope_pos
    rp = jnp.clip(rp0[:, None] + jnp.arange(k)[None, :], 0,
                  dims.max_len - 1)  # (B, k) TRUE positions
    cos = cos_t[rp][:, None]  # (B, 1, k, hd/2)
    sin = sin_t[rp][:, None]
    x = params["tok_emb"]["table"].astype(dtype)[block]  # (B, k, d)
    # query j (at stream position pos+j) may attend cache slots c ≤ pos+j
    cpos = jnp.clip(pos[:, None] + jnp.arange(k)[None, :], 0, C - 1)  # (B,k)
    mask = (jnp.arange(C)[None, None, None, :]
            <= cpos[:, None, :, None])  # (B, 1, k, C)
    if kv_valid is not None:
        mask = mask & kv_valid[:, None, None, :]
    scale = hd ** -0.5
    b_idx = jnp.arange(B)
    kv_idx = jnp.arange(HKV)

    G = H // HKV
    kv_d = HKV * hd
    for layer in range(dims.n_layers):
        p = jax.tree.map(lambda a: a[layer], params["blocks"])
        p8 = None if q8 is None else q8["blocks"][layer]

        xn = rms_norm(p["ln_attn"], x)
        if p8 is None:
            q = linear(p["attn"]["q"], xn, dtype)
            kk = linear(p["attn"]["k"], xn, dtype)
            vv = linear(p["attn"]["v"], xn, dtype)
        else:
            # fused QKV (see llm_decode_step): one launch, bitwise equal
            qkv = linear_q8({}, p8["attn_qkv"], xn, dtype)
            q = qkv[..., :dims.d_model]
            kk = qkv[..., dims.d_model:dims.d_model + kv_d]
            vv = qkv[..., dims.d_model + kv_d:]
        q = q.reshape(B, k, H, hd).transpose(0, 2, 1, 3)
        kk = kk.reshape(B, k, HKV, hd).transpose(0, 2, 1, 3)
        vv = vv.reshape(B, k, HKV, hd).transpose(0, 2, 1, 3)
        q = apply_rope(q, cos, sin)
        kk = apply_rope(kk, cos, sin)
        # per-row scatter: row b writes its k fresh K/V at pos_b..pos_b+k-1
        cache_k = cache_k.at[layer, b_idx[:, None, None],
                             kv_idx[None, :, None],
                             cpos[:, None, :], :].set(
            kk.astype(cache_k.dtype))
        cache_v = cache_v.at[layer, b_idx[:, None, None],
                             kv_idx[None, :, None],
                             cpos[:, None, :], :].set(
            vv.astype(cache_v.dtype))
        # grouped-query attention without materializing the repeated
        # cache (see llm_decode_step): (G, k) query rows per kv head
        ck = cache_k[layer].astype(dtype)  # (B, HKV, C, hd)
        cv = cache_v[layer].astype(dtype)
        qg = (q * scale).reshape(B, HKV, G * k, hd)
        s = jnp.einsum("bhqd,bhkd->bhqk", qg, ck,
                       preferred_element_type=jnp.float32
                       ).reshape(B, HKV, G, k, C)
        s = jnp.where(mask[:, None], s, -1e30)
        probs = jax.nn.softmax(s, axis=-1).astype(dtype)
        o = jnp.einsum("bhgqk,bhkd->bhgqd", probs, cv,
                       preferred_element_type=jnp.float32).astype(dtype)
        # (B, HKV, G, k, hd) -> (B, k, H*hd): head h = kv*G + g
        o = o.transpose(0, 3, 1, 2, 4).reshape(B, k, dims.d_model)
        if p8 is None:
            x = x + linear(p["attn"]["o"], o, dtype)
            xm = rms_norm(p["ln_mlp"], x)
            x = x + swiglu(p["mlp"], xm, dtype)
        else:
            x = x + linear_q8(p["attn"]["o"], p8["attn_o"], o, dtype)
            xm = rms_norm(p["ln_mlp"], x)
            gu = linear_q8({}, p8["mlp_gateup"], xm, dtype)
            gate, up = gu[..., :dims.d_ff], gu[..., dims.d_ff:]
            x = x + linear_q8(p["mlp"]["down"], p8["mlp_down"],
                              jax.nn.silu(gate) * up, dtype)

    x = rms_norm(params["ln_f"], x)
    if q8 is None:
        logits = linear(params["lm_head"], x, dtype).astype(jnp.float32)
    else:
        logits = linear_q8(params["lm_head"], q8["lm_head"], x,
                           dtype=jnp.float32)
    return logits, cache_k, cache_v


def llm_speculative_generate(
    params: Params,
    dims: LLMDims,
    prompt: jax.Array,  # (B, P) int32 (left-padded when prompt_mask given)
    max_new_tokens: int,
    eos_id: int,
    spec_k: int = 8,
    dtype: jnp.dtype = jnp.bfloat16,
    prompt_mask: jax.Array | None = None,  # (B, P) bool, False = left-pad
    decoder_q8: Params | None = None,  # quantize_llm_weights output
    return_stats: bool = False,
) -> jax.Array:
    """Greedy decode with speculative multi-token steps — output is
    EXACTLY :func:`llm_generate`'s at ``temperature=0`` (greedy
    verification accepts a draft token only when it equals the model's own
    argmax, and the bonus token IS the model's argmax).

    ``return_stats=True`` additionally returns the number of block-verify
    iterations (scalar int32): tokens-per-verify — the drafter's measured
    acceptance — is (emitted − 1) / iterations (the first token comes
    from the prefill, not a verify step).

    Same mechanism as whisper's ``speculative_greedy_decode``: each
    iteration drafts ``spec_k-1`` tokens with the zero-cost n-gram drafter
    (prompt-lookup decoding — RAG answers and contextual headers copy
    context spans, exactly the regime n-gram drafting accepts well), then
    verifies the block in ONE :func:`llm_block_verify` pass: per accepted
    run of a+1 tokens the weights/lm_head are read once instead of a+1
    times. Worst case degrades to ≈1 weight-read per token — the status
    quo. Rows advance independently (per-row positions).

    Returns (B, P+max_new) with positions past EOS filled with ``eos_id``
    — same contract as :func:`llm_generate`.
    """
    from audio_rag_tpu.models.whisper import ngram_draft

    B, Pl = prompt.shape
    hd = dims.d_model // dims.n_heads
    k = spec_k
    total = Pl + max_new_tokens
    # cache headroom: a block write may extend k-1 slots past a row's
    # last real position
    cache_len = min(dims.max_len, total) + k
    lk = jnp.zeros((dims.n_layers, B, dims.n_kv_heads, cache_len, hd), dtype)
    lv = jnp.zeros_like(lk)

    kv_valid = None
    pos_ids = None
    row_offset = jnp.zeros((B,), jnp.int32)
    if prompt_mask is not None:
        kv_valid = jnp.concatenate(
            [prompt_mask.astype(bool),
             jnp.ones((B, cache_len - Pl), bool)], axis=1
        )
        pos_ids = jnp.maximum(
            jnp.cumsum(prompt_mask.astype(jnp.int32), axis=1) - 1, 0)
        row_offset = (Pl - prompt_mask.astype(jnp.int32).sum(axis=1)
                      ).astype(jnp.int32)

    logits, (lk, lv) = llm_forward(
        params, dims, prompt, 0, (lk, lv), dtype,
        kv_valid=kv_valid[:, :cache_len] if kv_valid is not None else None,
        pos_ids=pos_ids,
        # left-padded rows all end at frame Pl-1; projecting only that
        # position avoids the (B, T, vocab) fp32 logits OOM (see
        # llm_forward docstring)
        last_pos=jnp.full((B,), Pl - 1, jnp.int32),
    )
    first = jnp.argmax(logits[:, -1, :], axis=-1).astype(jnp.int32)

    tokens = jnp.full((B, total), eos_id, jnp.int32)
    tokens = tokens.at[:, :Pl].set(prompt)
    tokens = tokens.at[:, Pl].set(first)
    finished = first == eos_id
    n_tok = jnp.full((B,), Pl, jnp.int32)  # index of last valid token
    b_idx = jnp.arange(B)

    def cond(state):
        _, _, _, _, finished, _ = state
        return ~jnp.all(finished)

    def body(state):
        tokens, n_tok, lk, lv, finished, iters = state
        cur = tokens[b_idx, n_tok]  # (B,)
        drafts = ngram_draft(tokens, n_tok, k - 1)  # (B, k-1)
        block = jnp.concatenate([cur[:, None], drafts], axis=1)  # (B, k)
        logits, lk, lv = llm_block_verify(
            params, dims, block, n_tok, lk, lv,
            kv_valid=kv_valid, rope_pos=n_tok - row_offset,
            dtype=dtype, q8=decoder_q8,
        )
        f = jnp.argmax(logits, axis=-1).astype(jnp.int32)  # (B, k)

        # greedy acceptance: draft j+1 survives iff it equals the model's
        # own argmax f_j given the prefix; emitted tokens are therefore
        # f[:, 0..a] (accepted drafts ARE the argmaxes, plus the bonus)
        match = block[:, 1:] == f[:, :-1]  # (B, k-1)
        a = jnp.sum(jnp.cumprod(match.astype(jnp.int32), axis=1), axis=1)
        # stop at the first emitted EOS, and never write past total-1
        eos_pos = jnp.argmax(f == eos_id, axis=1)
        has_eos = jnp.any(f == eos_id, axis=1)
        a = jnp.where(has_eos, jnp.minimum(a, eos_pos), a)
        a = jnp.minimum(a, total - 2 - n_tok)  # emission bound

        j_grid = jnp.arange(k)[None, :]
        write = (j_grid <= a[:, None]) & ~finished[:, None]  # (B, k)
        # UNCLIPPED destinations + mode="drop" (see whisper's note:
        # clipping would alias several j onto the last slot and the stale
        # duplicate would win the scatter)
        dst = n_tok[:, None] + 1 + j_grid
        old = jnp.take_along_axis(
            tokens, jnp.clip(dst, 0, total - 1), axis=1)
        tokens = tokens.at[b_idx[:, None], dst].set(
            jnp.where(write, f, old), mode="drop")

        n_new = jnp.where(finished, 0, a + 1)
        n_tok = n_tok + n_new
        emitted_eos = jnp.any((f == eos_id) & write, axis=1)
        finished = finished | emitted_eos | (n_tok >= total - 1)
        return tokens, n_tok, lk, lv, finished, iters + 1

    tokens, _, _, _, _, iters = jax.lax.while_loop(
        cond, body,
        (tokens, n_tok, lk, lv, finished, jnp.int32(0)),
    )
    if return_stats:
        return tokens, iters
    return tokens


def llm_generate(
    params: Params,
    dims: LLMDims,
    prompt: jax.Array,  # (B, P) int32
    max_new_tokens: int,
    eos_id: int,
    temperature: float = 0.0,
    rng: jax.Array | None = None,
    dtype: jnp.dtype = jnp.bfloat16,
    prompt_mask: jax.Array | None = None,  # (B, P) bool, False = left-pad
    decoder_q8: Params | None = None,  # quantize_llm_weights output
) -> jax.Array:
    """Batched sampling with static KV cache; returns (B, P+max_new)."""
    B, Pl = prompt.shape
    hd = dims.d_model // dims.n_heads
    total = Pl + max_new_tokens
    cache_len = min(dims.max_len, total)
    lk = jnp.zeros((dims.n_layers, B, dims.n_kv_heads, cache_len, hd), dtype)
    lv = jnp.zeros_like(lk)

    kv_valid = None
    pos_ids = None
    row_offset = jnp.zeros((B,), jnp.int32)
    if prompt_mask is not None:
        kv_valid = jnp.concatenate(
            [prompt_mask.astype(bool),
             jnp.ones((B, cache_len - Pl), bool)], axis=1
        )
        # TRUE positions: rope counts each row's real tokens, not the
        # left-padded frame (HF llama semantics; also keeps this path
        # bit-identical to the continuous-batching slots, which the
        # wave-vs-continuous parity test pins)
        pos_ids = jnp.maximum(
            jnp.cumsum(prompt_mask.astype(jnp.int32), axis=1) - 1, 0)
        row_offset = (Pl - prompt_mask.astype(jnp.int32).sum(axis=1)
                      ).astype(jnp.int32)

    logits, (lk, lv) = llm_forward(
        params, dims, prompt, 0, (lk, lv), dtype,
        kv_valid=kv_valid[:, :cache_len] if kv_valid is not None else None,
        pos_ids=pos_ids,
        last_pos=jnp.full((B,), Pl - 1, jnp.int32),  # see llm_forward
    )
    if rng is None:
        rng = jax.random.PRNGKey(0)

    def pick(logits_last, key):
        if temperature <= 0.0:
            return jnp.argmax(logits_last, axis=-1).astype(jnp.int32)
        return jax.random.categorical(
            key, logits_last / temperature, axis=-1
        ).astype(jnp.int32)

    k0, rng = jax.random.split(rng)
    first = pick(logits[:, -1, :], k0)
    tokens = jnp.full((B, total), eos_id, jnp.int32)
    tokens = tokens.at[:, :Pl].set(prompt)
    tokens = tokens.at[:, Pl].set(first)
    finished = first == eos_id

    def cond(state):
        i, _, _, _, finished, _ = state
        return (i < total - 1) & ~jnp.all(finished)

    def body(state):
        i, tokens, lk, lv, finished, rng = state
        cur = jax.lax.dynamic_slice(tokens, (0, i), (B, 1))[:, 0]
        # SCALAR frame position: every row writes cache frame i, so the
        # KV write is an in-place dynamic_update_slice instead of a
        # scatter (see llm_decode_step); rope positions stay per-row
        # only when left-padding offsets them
        logits, lk, lv = llm_decode_step(
            params, dims, cur, i, lk, lv,
            kv_valid=kv_valid, dtype=dtype,
            rope_pos=None if prompt_mask is None else i - row_offset,
            q8=decoder_q8,
        )
        key, rng = jax.random.split(rng)
        nxt = pick(logits, key)
        nxt = jnp.where(finished, eos_id, nxt)
        tokens = jax.lax.dynamic_update_slice(tokens, nxt[:, None], (0, i + 1))
        return i + 1, tokens, lk, lv, finished | (nxt == eos_id), rng

    _, tokens, _, _, _, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(Pl), tokens, lk, lv, finished, rng)
    )
    return tokens
