"""Validated configuration tree.

Parity: reference ``config/schema.py:7-133`` — same section names and keys
(`asr`, `diarization`, `alignment`, `chunking`, `contextual`, `embedding`,
`retrieval`, `reranking`, `expansion`, `generation`, `tts`, `resources`,
plus `log_level`/`data_dir`/`cache_dir`) so reference YAML configs load
unchanged where meaningful.

TPU-first deltas:
* ``device`` accepts ``tpu`` and ``compute_type`` defaults to ``bfloat16``.
* new ``mesh`` section: device-mesh axes for dp/tp sharding (`pjit`).
* retrieval backend default is the in-process HBM-resident ``tpu`` store
  (the Qdrant-compatible knobs are retained and ignored by it).
"""

from __future__ import annotations

from typing import Literal

from pydantic import BaseModel, Field


class MeshConfig(BaseModel):
    """Device mesh for sharded inference (TPU-native addition)."""

    #: number of devices along the data axis (-1 = all remaining)
    data_axis: int = -1
    #: number of devices along the model (tensor-parallel) axis
    model_axis: int = 1
    #: axis names used in PartitionSpecs throughout the framework
    data_axis_name: str = "data"
    model_axis_name: str = "model"
    #: run on CPU with this many virtual devices when >0 (testing)
    force_host_device_count: int = 0


class ASRConfig(BaseModel):
    backend: Literal["whisper-jax", "streaming-whisper", "fake"] = "whisper-jax"
    #: "test" is a tiny random-init preset for CI / weight-free environments
    model_size: Literal[
        "tiny", "base", "small", "medium", "large-v2", "large-v3",
        "test", "test-ml", "tiny-synth"
    ] = "large-v3"
    device: Literal["tpu", "cpu", "auto"] = "auto"
    compute_type: Literal["bfloat16", "float32"] = "bfloat16"
    vad_filter: bool = True
    vad_threshold: float = Field(default=0.5, ge=0.0, le=1.0)
    #: "auto" = learned conv VAD when its weights are available, else energy
    vad_backend: Literal["auto", "learned", "energy"] = "auto"
    language: str | None = None
    #: decode strategy for the autoregressive loop
    decode: Literal["greedy", "beam"] = "greedy"
    beam_size: int = Field(default=5, ge=1, le=16)
    #: speculative multi-token greedy decode: verify blocks of this many
    #: tokens per device step against the zero-cost n-gram drafter
    #: (prompt-lookup). 0 disables. Output is EXACTLY greedy's (greedy
    #: verification), but each accepted run reads the decoder weights and
    #: cross KV — the memory-bound decode loop's dominant HBM terms —
    #: once instead of once per token. Applies to greedy at temperature
    #: 0; the temperature-fallback ladder and beam take their own paths.
    speculative_k: int = Field(default=0, ge=0, le=8)
    #: faster-whisper quality gates: retry low-confidence windows at higher
    #: temperatures; drop windows Whisper itself flags as non-speech
    temperature_fallback: bool = True
    fallback_temperatures: list[float] = Field(
        default_factory=lambda: [0.2, 0.4]
    )
    logprob_threshold: float = -1.0
    #: gzip-ratio repetition gate (Whisper: decoded text compressing better
    #: than 2.4× signals a repetition loop → retry at higher temperature)
    compression_ratio_threshold: float = 2.4
    no_speech_threshold: float = Field(default=0.6, ge=0.0, le=1.0)
    #: faster-whisper's default decode conditioning (reference
    #: ``asr/whisper.py:120-126`` inherits it): each 30 s window's prompt
    #: carries the previous windows' decoded tokens (``<|startofprev|>``
    #: + up to n_text_ctx/2−1 of them), improving cross-window
    #: consistency on real weights. OFF by default here because it
    #: chains windows — window k's prompt needs window k−1's output — so
    #: the window batch serializes to 1 and RTF rises ~an order of
    #: magnitude (measured in docs/PERFORMANCE.md "Conditioned decode");
    #: set True for transcript parity with the reference's defaults.
    #: Previous-token context truncates DOWN to a small bucket set
    #: ({4, 8, 16, 32, 64, 128, cap} tokens, capped at n_text_ctx/2−1;
    #: see ``WhisperJAX._prompt_buckets``) so the compiled-program set
    #: stays bounded — steady state on real speech uses the full-cap
    #: bucket, matching faster-whisper exactly.
    condition_on_previous_text: bool = False
    #: reset the conditioning history after any window that needed a
    #: fallback temperature above this (faster-whisper's
    #: ``prompt_reset_on_temperature``): a low-quality window must not
    #: poison the next window's prompt
    prompt_reset_on_temperature: float = Field(default=0.5, ge=0.0)
    #: batch 30s windows together instead of sequential decode
    window_batch_size: int = Field(default=8, ge=1)
    #: compute each time-CONTIGUOUS window batch's mel as ONE time-axis-
    #: sharded program (``ops/mel.log_mel_sharded``: ppermute halo
    #: exchange + global pmax for the max−8 clamp) when the mesh has >1
    #: data device. This is the SURVEY §2.4 long-audio path — per-chip
    #: peak memory scales as span/n_data, so hour-scale files stream
    #: through the fixed window_batch_size program with flat memory (the
    #: reference hard-caps files at 30 min, config/schema.py:114). It is
    #: also closer to upstream Whisper than per-window mel: frames are
    #: continuous across 30 s window joins and the clamp is global over
    #: the span (openai/whisper audio.py computes ONE full-file mel and
    #: slices). Single-data-device meshes and non-contiguous (VAD-gapped)
    #: batches use the batched per-window mel either way.
    mel_sharded: bool = True
    #: cap on generated tokens per 30s window (None = whisper's 224). A 5s
    #: streaming chunk holds ~40 tokens of speech — decoding 224 wastes
    #: 5x sequential decoder steps; the streaming wrapper sets this
    max_decode_tokens: int | None = Field(default=None, ge=8)
    #: int8-quantize the cross-attention K/V the decode loop re-reads every
    #: token (logit error <2% of range). On TPU this runs a Pallas kernel
    #: that dequantizes in VMEM (``ops/pallas_kernels.decode_cross_
    #: attention_q8``) — XLA's own int8 lowering was 4.7× slower, and the
    #: kernel's batched-dot form measured 2.7× FASTER than the bf16 einsum
    #: per layer-step (v5e, large-v3 shapes): clip RTF 0.0254 vs 0.0289
    #: bf16 at window batch 16, while also halving the ≈4 GB decode
    #: workspace. Validation status: exact 12-token greedy parity against a
    #: released whisper-tiny HF checkpoint (tests/unit/models/
    #: test_hf_parity.py) plus measured logit divergence at PRODUCTION
    #: large-v3 dims: 0.71 % of the logit range single-step, and the full
    #: int8 profile's 64-step greedy windows match bf16 decode 99.6 %
    #: token-for-token (docs/bench_runs/quant_numerics.json, pinned by
    #: tests/unit/ops/test_quant_numerics_evidence.py); large-v3 WER
    #: itself is unvalidated in this zero-egress image.
    #: configs/production.yaml enables it with that caveat; disable here
    #: if a WER regression is observed on real audio.
    cross_kv_int8: bool = False
    #: int4-quantize the cross K/V instead (nibble-packed along head_dim,
    #: per-CHANNEL scales — per-head is too coarse at 4 bits;
    #: ``ops/pallas_kernels.decode_cross_attention_q4``). Measured on
    #: chip this is a CAPACITY lever, not a speed lever: the in-VMEM
    #: nibble unpack costs more than the bandwidth it saves (kernel
    #: 0.128 ms/layer-step vs int8's 0.067; all-int4 full clip RTF
    #: 0.0067 vs int8's 0.0059 — docs/PERFORMANCE.md "int4 decode
    #: paths"). Enable it to halve the KV's HBM residency — e.g. it
    #: frees ~1 GB at beam-5/window-batch-16, which otherwise OOMs by
    #: ~30 MB. Takes precedence over ``cross_kv_int8``.
    #: Quantization error stays comparable to int8's for the KV (0.74 %
    #: vs 0.71 % of logit range single-step at large-v3 dims; the
    #: int8+kv4 capacity profile matches bf16 greedy 99.8 % —
    #: docs/bench_runs/quant_numerics.json) and greedy parity holds on
    #: the whisper-tiny HF checkpoint (test_hf_parity.py), but
    #: real-audio WER is unvalidated in this zero-egress image; prefer
    #: int8 where WER headroom is unknown.
    cross_kv_int4: bool = False
    #: int8-quantize the decode loop's WEIGHT matmuls (attention/cross/MLP
    #: linears + logits head, per-out-channel scales) — the other half of
    #: the per-step HBM bytes. Same Pallas in-VMEM dequant pattern
    #: (``ops/pallas_kernels.matmul_q8w``); measured 1.3–1.7× per matmul
    #: on a v5e. Same validation status and production stance as
    #: ``cross_kv_int8`` (1.3 % of logit range single-step at large-v3
    #: dims — docs/bench_runs/quant_numerics.json). Note the int8 copies
    #: cost extra HBM at load time (~0.8 GB for large-v3; accounted in
    #: the backend's hbm_required_gb).
    decoder_int8: bool = False
    #: int4-quantize the same decode-loop weight matmuls (group-wise
    #: scales, ``ops/pallas_kernels.matmul_q4w`` — the weight regime the
    #: reference itself serves via ollama Q4). Halves the int8 weight
    #: bytes again — but measured on chip the unpack cost loses at every
    #: matmul shape except the very wide vocab projection (q4w 0.100 ms
    #: vs q8w 0.186 at (1280, 51968); all-int4 full clip RTF 0.0067 vs
    #: int8's 0.0059 — docs/PERFORMANCE.md "int4 decode paths"), so this
    #: is a footprint option, not the speed profile. Takes precedence
    #: over ``decoder_int8``. Quantization error is inherently larger
    #: than int8's (≲7 % per weight at group amax vs ≲0.4 %; measured
    #: 11.9 % of logit range single-step at large-v3 dims vs int8's
    #: 1.3 %, though the all-int4 greedy profile still matches bf16
    #: decode 99.2 % token-for-token —
    #: docs/bench_runs/quant_numerics.json) — unvalidated on real
    #: checkpoints in this zero-egress image; prefer int8 where WER
    #: headroom is unknown.
    decoder_int4: bool = False
    #: with ``decoder_int8``: int4-quantize ONLY the logits head (the
    #: (1280, 51968) vocab projection) — the one decode matmul where the
    #: on-chip table shows int4 beating int8 (0.100 vs 0.186 ms at B=16;
    #: docs/PERFORMANCE.md "int4 decode paths"), because the fixed unpack
    #: cost amortizes over the huge output dim while the bandwidth saved
    #: scales with it. Keeps int8's attention/MLP speed; also shaves
    #: ~0.3 GB off the quantized-copy HBM. Same mixed profile as
    #: ``GenerationConfig.lm_head_int4``. No effect when ``decoder_int4``
    #: already covers the head; numerics evidence at production dims:
    #: docs/bench_runs/quant_numerics.json.
    lm_head_int4: bool = False
    #: int8-quantize the decode loop's SELF-attention KV cache with
    #: per-POSITION scales (amax over head_dim at write time — finer
    #: granularity than the cross KV's per-(batch, head) scales; packed
    #: scales+causal-mask operand, `ops/pallas_kernels.decode_self_
    #: attention_q8`). With the cross KV and weights already quantized,
    #: the bf16 self cache is the decode step's largest remaining HBM
    #: read (~1.2 GB/step at window batch 32) — this halves the payload
    #: bytes and the cache's HBM residency. **Measured NEGATIVE on chip**
    #: (same-session wb32 A/B: RTF 0.0077 vs 0.0061 with bf16 self-KV —
    #: docs/bench_runs/asr_greedy_wb32_kvint4_lm4_{skv8,control3}.json):
    #: the int8 tile forces a transposed (hd, Cp) layout whose per-step
    #: writes land on the LANE axis (3 scatters × 32 layers), C pads
    #: 224→256, and the packed scales operand adds ~0.13 GB/step — the
    #: overheads eat more than the ~0.4 GB/step the int8 payload saves.
    #: Kept as a correct, tested capacity option (halves self-cache
    #: residency); OFF in every shipped profile. Greedy decode only.
    self_kv_int8: bool = False
    checkpoint_path: str | None = None


class StreamingSchema(BaseModel):
    """Live-transcription buffering profile (WS ``/api/v1/ws/transcribe``).

    Parity surface: the reference hardcodes 5 s chunks / 1 s overlap
    (``asr/streaming.py:30-36``) because its per-chunk processing is
    0.5–1.5 s — shrinking the buffer would outrun the model. Here a chunk
    processes in ~0.44 s (int8 decode path, docs/PERFORMANCE.md), so the
    buffer IS the perceived latency and is worth tuning per deployment:
    ``configs/low_latency.yaml`` ships a 3 s profile (~3.5 s perceived
    vs ~5.4 s at the 5 s default; the reference measures 5–7 s).
    """

    #: seconds of audio buffered before each transcription pass
    chunk_duration: float = Field(default=5.0, ge=0.5, le=30.0)
    #: seconds re-fed from the previous chunk (transcript stitching uses
    #: the overlap to dedupe words; keep ~20% of chunk_duration)
    overlap_duration: float = Field(default=1.0, ge=0.0, le=10.0)
    #: decode budget per chunk (speech holds ~8 tokens/s; whisper's full
    #: 224-token window budget wastes sequential decoder steps)
    max_decode_tokens: int = Field(default=64, ge=8, le=224)
    #: drop a chunk's transcript when avg logprob falls below this
    min_avg_logprob: float | None = None
    #: concurrent live sessions served per process. The reference allows 1
    #: (its WS handler takes a process lock — each chunk owns the GPU);
    #: here concurrent sessions' chunks multiplex into ONE window-batch
    #: dispatch (``asr/mux.py``), so N sessions share the decode loop's
    #: weight reads instead of queuing behind each other. Sessions beyond
    #: this limit are refused at the WebSocket with a clear error.
    max_sessions: int = Field(default=8, ge=1, le=64)

    def to_runtime(self):
        """The asr.streaming dataclass the StreamingASR wrapper consumes."""
        from audio_rag_tpu.asr.streaming import StreamingConfig

        return StreamingConfig(
            chunk_duration=self.chunk_duration,
            overlap_duration=self.overlap_duration,
            max_decode_tokens=self.max_decode_tokens,
            min_avg_logprob=self.min_avg_logprob,
        )


class DiarizationConfig(BaseModel):
    backend: Literal["clustering", "ahc", "fake"] = "clustering"
    model: str = "titanet-jax"
    device: Literal["tpu", "cpu", "auto"] = "auto"
    min_speakers: int | None = None
    max_speakers: int | None = Field(default=8, ge=1)
    min_speech_duration_ms: int = Field(default=250, ge=0)
    #: VAD gating the speaker windows (reference nemo.py:45-53, marblenet)
    vad_backend: Literal["auto", "learned", "energy"] = "auto"
    #: AHC engine: merge clusters while avg cosine distance < threshold
    ahc_threshold: float = Field(default=0.35, ge=0.0, le=2.0)
    #: AHC engine: emit a window for its 2nd speaker too when its
    #: similarity is within this margin of the best (0 = single-label)
    overlap_margin: float = Field(default=0.0, ge=0.0, le=1.0)
    #: speaker-embedding window/shift (seconds), reference nemo.py:54-66
    window_s: float = 1.5
    shift_s: float = 0.75
    checkpoint_path: str | None = None


class AlignmentConfig(BaseModel):
    method: Literal["word_level", "segment_level"] = "word_level"
    #: tolerance for nearest-segment fallback (reference aligner.py:74)
    tolerance_s: float = 0.5


class ChunkingConfig(BaseModel):
    strategy: Literal["speaker_turn", "semantic", "fixed"] = "speaker_turn"
    max_tokens: int = Field(default=256, ge=50, le=2000)
    overlap_tokens: int = Field(default=50, ge=0)
    min_chunk_tokens: int = Field(default=30, ge=1)


class ContextualConfig(BaseModel):
    enabled: bool = False
    window_size: int = Field(default=1, ge=0, le=3)
    #: header source: ``llm`` prompts the generation backend per chunk
    #: (reference ``contextual/processor.py:114-117`` semantics, batched
    #: here); ``extractive`` derives headers deterministically from
    #: tf-idf-salient neighbor terms absent from the chunk — no model,
    #: CPU-cheap, usable when no LLM weights are available
    backend: Literal["llm", "extractive"] = "llm"
    #: terms per extractive header
    extractive_terms: int = Field(default=4, ge=1, le=16)


class EmbeddingConfig(BaseModel):
    backend: Literal["bge-m3", "multilingual-e5", "fake"] = "bge-m3"
    model: str = "BAAI/bge-m3"
    device: Literal["tpu", "cpu", "auto"] = "auto"
    batch_size: int = Field(default=32, ge=1)
    normalize: bool = True
    use_sparse: bool = True
    max_length: int = Field(default=512, ge=16, le=8192)
    checkpoint_path: str | None = None


class RetrievalConfig(BaseModel):
    backend: Literal["tpu", "fake"] = "tpu"
    collection_name: str = "audio_rag"
    search_type: Literal["dense", "sparse", "hybrid"] = "hybrid"
    top_k: int = Field(default=5, ge=1, le=100)
    score_threshold: float = Field(default=0.0, ge=0.0, le=1.0)
    dense_weight: float = Field(default=0.7, ge=0.0, le=1.0)
    sparse_weight: float = Field(default=0.3, ge=0.0, le=1.0)
    #: RRF constant for hybrid fusion (2.0 matches Qdrant's fusion constant,
    #: which the reference relies on via FusionQuery(RRF))
    rrf_k: float = Field(default=2.0, ge=0.0)
    #: fixed sparse widths (docs truncated to strongest max_doc_nnz terms)
    max_doc_nnz: int = Field(default=128, ge=8)
    max_query_nnz: int = Field(default=64, ge=8)
    #: persistence root for collections (npz shards + manifest)
    persist_dir: str | None = None
    #: pad collections to multiples of this many rows for static shapes
    capacity_step: int = Field(default=4096, ge=128)
    #: int8-quantize the dense corpus (4x HBM capacity, MXU int8 matmuls;
    #: per-row symmetric scales, ~1e-2 score error)
    quantize_dense: bool = False


class RerankingConfig(BaseModel):
    backend: Literal["bge-reranker", "fake", "none"] = "bge-reranker"
    model: str = "BAAI/bge-reranker-base"
    device: Literal["tpu", "cpu", "auto"] = "auto"
    top_k: int = Field(default=5, ge=1, le=50)
    initial_k: int = Field(default=20, ge=1, le=100)
    batch_size: int = Field(default=16, ge=1)
    max_length: int = Field(default=512, ge=16, le=4096)
    #: fixed doc width of the device-resident rerank token cache used by the
    #: single-program query path (passage tokens incl. trailing </s>); docs
    #: truncate here exactly as max_length truncates them on the host path
    fused_doc_tokens: int = Field(default=224, ge=16)
    checkpoint_path: str | None = None


class ExpansionConfig(BaseModel):
    #: ``hyde`` embeds an LLM-written hypothetical answer passage
    #: (reference ``expansion/hyde.py``); ``prf`` is RM3-style
    #: pseudo-relevance feedback — expand the query with tf-idf-salient
    #: terms from its own first-pass top results (no model; measurable
    #: on the quality sweep, unlike HyDE which needs trained LLM weights)
    backend: Literal["hyde", "prf", "none"] = "none"
    num_hypotheses: int = Field(default=1, ge=1, le=3)
    #: PRF: feedback depth (first-pass results mined for terms)
    prf_depth: int = Field(default=5, ge=1, le=50)
    #: PRF: number of expansion terms appended to the query. Few and
    #: high-confidence beats many: every appended term dilutes the
    #: original query's lexical weight, so drift grows with the count
    #: (measured on the eval sweep's tag queries)
    prf_terms: int = Field(default=3, ge=1, le=32)


class GenerationConfig(BaseModel):
    backend: Literal["llm-jax", "fake", "none"] = "llm-jax"
    model: str = "llama-3.2-3b"
    temperature: float = Field(default=0.7, ge=0.0, le=2.0)
    max_tokens: int = Field(default=1024, ge=1, le=8192)
    timeout: float = Field(default=60.0, ge=1.0)
    checkpoint_path: str | None = None
    #: int8-quantize the decode loop's weight matmuls (attention/swiglu
    #: linears + the 128k-vocab lm_head — the dominant per-token HBM term
    #: for small-batch generation). Same Pallas in-VMEM dequant as
    #: ``ASRConfig.decoder_int8``; per-out-channel scales. Validation
    #: status: per-out-channel quantization is exact-parity-tested at tiny
    #: scale; no released llama checkpoint is loadable in this zero-egress
    #: image, so generation quality under int8 is unvalidated on real
    #: weights. configs/production.yaml enables it with that caveat. The
    #: int8 copies cost extra HBM (accounted in hbm_required_gb).
    decoder_int8: bool = False
    #: int4-quantize the same matmuls (group-wise scales, Pallas
    #: ``matmul_q4w``) — the weight regime the reference itself serves
    #: (its default generation model is ollama ``llama3.2:3b`` = Q4_K_M).
    #: Halves the int8 weight bytes again on the weight-read-bound decode
    #: loop — but measured per-matmul the unpack cost loses except at the
    #: vocab-projection shape (docs/PERFORMANCE.md "int4 decode paths";
    #: the 128k-row lm_head is ~22 % of 1b's weight bytes, so a mixed
    #: int8+int4-lm_head profile is the candidate, not all-int4). Takes
    #: precedence over ``decoder_int8``. Larger quantization error than
    #: int8 (zero-egress: unvalidated on real weights).
    decoder_int4: bool = False
    #: MIXED profile: with ``decoder_int8``, int4-quantize ONLY the
    #: vocab projection (group-wise ``matmul_q4w``) — the one matmul
    #: where the on-chip table shows int4 beating int8 (its dout≈128k
    #: amortizes the in-VMEM unpack; the head is ~22 % of 1b's weight
    #: bytes). Ignored when ``decoder_int4`` already makes everything
    #: int4 or when no decoder quantization is on. Measured A/B in
    #: docs/PERFORMANCE.md "LLM serving".
    lm_head_int4: bool = False
    #: speculative multi-token greedy decode for the wave path (same
    #: mechanism as ``ASRConfig.speculative_k``): n-gram prompt-lookup
    #: drafts verified in one teacher-forced block step — exact greedy
    #: output. RAG answers and contextual headers copy context spans, the
    #: regime n-gram drafting accepts well. Temperature>0 requests fall
    #: back to the step decode (speculative sampling would change the
    #: sample stream). 0 = off.
    speculative_k: int = Field(default=0, ge=0, le=8)
    #: hard cap on the prompt's pow-2 bucket in batch generation. Prefill
    #: compile cost/memory grows with the bucket, and one degenerate long
    #: prompt (an hour-long transcript quoted into a contextual header)
    #: otherwise compiles a seq-8184 program that OOMs the compile backend.
    #: Prompts longer than the cap keep their TAIL (instructions sit at the
    #: end of every prompt template in this package).
    max_prompt_tokens: int = Field(default=2048, ge=64)
    #: coalesce concurrent requests into batched decodes (engine/scheduler)
    use_scheduler: bool = True
    #: "wave" decodes each batch to completion (fewest dispatches — best
    #: for bulk ingest); "continuous" runs slot-based decode with
    #: join/leave at segment boundaries so short requests never wait for a
    #: long generation (engine/continuous.py)
    scheduler_mode: Literal["wave", "continuous"] = "wave"
    scheduler_max_batch: int = Field(default=16, ge=1)
    scheduler_max_wait_ms: float = Field(default=10.0, ge=0.0)
    #: continuous mode: decode-slot count and tokens per segment dispatch.
    #: Segment size trades the relay's per-dispatch cost against join
    #: latency — measured on a v5e (llama-3.2-1b, int8 weights, 8 slots):
    #: seg 16 = 433 tok/s @ 596 ms short-request p50; seg 32 = 478 @ 968;
    #: seg 48 = 490 @ 1325. 16 is the interactive sweet spot (bulk ingest
    #: uses wave mode, which pays one dispatch per batch).
    scheduler_slots: int = Field(default=8, ge=1)
    scheduler_segment_tokens: int = Field(default=16, ge=1)
    #: adaptive segments: when >segment_tokens and no request is waiting
    #: to join (and every live slot has the quota/cache), segments run
    #: this many steps — the seg-48 throughput without its join-latency
    #: price (engine/continuous.py::_segment_for_dispatch). 0 = off.
    scheduler_idle_segment_tokens: int = Field(default=48, ge=0)
    #: continuous mode: per-slot KV budget (attention cost per step is
    #: O(ctx); don't pay the model's full max_len for chat-sized requests)
    scheduler_context_tokens: int = Field(default=2048, ge=64)


class TTSConfig(BaseModel):
    backend: Literal["null", "piper", "edge-tts", "jax"] = "null"
    model: str = "en_US-lessac-medium"
    fallback_backend: Literal["null", "jax", "none"] = "null"
    output_format: Literal["wav"] = "wav"
    sample_rate: int = Field(default=22050, ge=8000, le=48000)


class ResourceConfig(BaseModel):
    """HBM budget for the shared mesh (replaces the reference's VRAM LRU)."""

    max_hbm_gb: float = Field(default=14.0, ge=1.0)
    max_ram_gb: float = Field(default=16.0, ge=1.0)
    unload_after_idle_seconds: int = Field(default=300, ge=0)
    #: mixed-workload serving policy: keep the query path's models
    #: (embeddings + reranking, ~3.7 GB) exempt from LRU eviction so
    #: steady query traffic never pays a model reload while ingest swaps
    #: whisper↔llama around them. Requires the ingest heavyweights to fit
    #: in the REMAINING budget (they do: llama-3.2-3b int8 10.2 GB +
    #: 3.7 GB pinned ≤ 14 GB); ensure_hbm fails loudly otherwise.
    pin_query_models: bool = False
    #: the reference capped at 30/180 min (GPU memory pressure); here
    #: windows stream through fixed-size device batches and mel can shard
    #: across the mesh's time axis, so hour-scale files are first-class
    max_audio_duration_minutes: int = Field(default=480, ge=1)


class AudioRAGConfig(BaseModel):
    mesh: MeshConfig = Field(default_factory=MeshConfig)
    asr: ASRConfig = Field(default_factory=ASRConfig)
    streaming: StreamingSchema = Field(default_factory=StreamingSchema)
    diarization: DiarizationConfig = Field(default_factory=DiarizationConfig)
    alignment: AlignmentConfig = Field(default_factory=AlignmentConfig)
    chunking: ChunkingConfig = Field(default_factory=ChunkingConfig)
    contextual: ContextualConfig = Field(default_factory=ContextualConfig)
    embedding: EmbeddingConfig = Field(default_factory=EmbeddingConfig)
    retrieval: RetrievalConfig = Field(default_factory=RetrievalConfig)
    reranking: RerankingConfig = Field(default_factory=RerankingConfig)
    expansion: ExpansionConfig = Field(default_factory=ExpansionConfig)
    generation: GenerationConfig = Field(default_factory=GenerationConfig)
    tts: TTSConfig = Field(default_factory=TTSConfig)
    resources: ResourceConfig = Field(default_factory=ResourceConfig)
    log_level: Literal["DEBUG", "INFO", "WARNING", "ERROR"] = "INFO"
    data_dir: str = "./data"
    cache_dir: str = "./cache"
