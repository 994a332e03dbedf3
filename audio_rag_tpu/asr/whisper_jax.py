"""Batch Whisper ASR backend on the TPU engine.

Parity surface: reference ``asr/whisper.py:14-207`` (FasterWhisperASR:
transcribe / transcribe_with_words, VAD filter, per-size VRAM table).
TPU-first pipeline per file:

1. host: decode → resample 16 kHz → energy-VAD speech spans (optional)
2. host: slice into 30 s windows (batched, padded — static shapes)
3. device: log-mel (matmul DFT) → encoder → KV-cached greedy decode,
   **all windows of a batch decoded simultaneously** (the reference's
   CTranslate2 walks windows sequentially)
4. host: strip special tokens, parse timestamp tokens into segments,
   distribute word timings (cross-attention DTW refinement:
   :mod:`audio_rag_tpu.asr.word_timing`)

Token→text uses the local HF Whisper tokenizer when ``checkpoint_path``
provides one; otherwise a deterministic id-map fallback (zero-egress builds).
"""

from __future__ import annotations

import functools
import os
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from audio_rag_tpu.asr.base import ASRRegistry
from audio_rag_tpu.asr.vad import VADOptions, speech_segments
from audio_rag_tpu.audio.io import decode_audio
from audio_rag_tpu.config.schema import ASRConfig
from audio_rag_tpu.core.base import BaseASR
from audio_rag_tpu.core.exceptions import TranscriptionError
from audio_rag_tpu.core.types import TranscriptSegment, Word
from audio_rag_tpu.engine.engine import bf16_storage, get_engine
from audio_rag_tpu.models.whisper import (
    WHISPER_PRESETS,
    SpecialTokens,
    WhisperDims,
    beam_decode,
    encode,
    greedy_decode,
    init_whisper,
)
from audio_rag_tpu.ops.mel import (
    HOP_LENGTH,
    N_SAMPLES,
    SAMPLE_RATE,
    log_mel_batch,
    log_mel_spectrogram,
)
from audio_rag_tpu.resources.manager import get_resource_manager
from audio_rag_tpu.utils.decorators import timed
from audio_rag_tpu.utils.logging import get_logger

log = get_logger(__name__)

__all__ = ["WhisperJaxASR", "HBM_ESTIMATES"]

#: static HBM estimates per model size (params + workspace), GB
HBM_ESTIMATES: dict[str, float] = {
    "tiny": 0.3, "base": 0.5, "small": 1.2, "medium": 3.2,
    "large-v2": 6.5, "large-v3": 6.5, "test": 0.05, "test-ml": 0.1,
    "tiny-synth": 0.05,
}

MAX_NEW_TOKENS = 224  # ≤ n_text_ctx/2, as Whisper decodes per window


@ASRRegistry.register("whisper-jax")
class WhisperJaxASR(BaseASR):
    """Batched-window Whisper on the shared mesh."""

    def __init__(self, config: ASRConfig | None = None):
        super().__init__()
        self.config = config or ASRConfig()
        size = self.config.model_size
        if size not in WHISPER_PRESETS:
            raise TranscriptionError(f"unknown whisper size {size!r}")
        self.dims: WhisperDims = WHISPER_PRESETS[size]
        self.tokens = SpecialTokens.for_dims(self.dims)
        self.hbm_required_gb = HBM_ESTIMATES.get(size, 6.5)
        # decode-loop weight quantization width: int4 > int8 > off
        qbits = 4 if self.config.decoder_int4 else (
            8 if self.config.decoder_int8 else 0)
        # lm_head_int4 narrows just the vocab projection (mixed profile)
        self._lm_head_bits = 4 if (
            qbits == 8 and getattr(self.config, "lm_head_int4", False)
        ) else None
        self._self_kv_int8 = bool(
            getattr(self.config, "self_kv_int8", False))
        if qbits:
            # the quantized weight copies coexist with the bf16 params —
            # count them so the ResourceManager can't over-admit
            # co-resident models past the real budget
            from audio_rag_tpu.models.whisper import q8_param_bytes

            self.hbm_required_gb += q8_param_bytes(
                self.dims, qbits, self._lm_head_bits) / 1e9
        self.dtype = (
            jnp.bfloat16 if self.config.compute_type == "bfloat16"
            else jnp.float32
        )
        self._params = None
        self._params_q8 = None
        # instance-level quantization switches: start from config,
        # downgraded at load time under tensor parallelism (the int8/int4
        # Pallas kernels are single-device programs GSPMD can't partition;
        # TP already halves+ the per-chip weight read they exist to shrink)
        self._cross_kv_bits = self._config_cross_kv_bits()
        self._decoder_qbits = qbits
        self._tokenizer = None

    def _config_cross_kv_bits(self) -> int:
        """Cross-KV quantization width from config: int4 > int8 > off."""
        if getattr(self.config, "cross_kv_int4", False):
            return 4
        return 8 if self.config.cross_kv_int8 else 0

    # -- lifecycle ---------------------------------------------------------
    def _load(self) -> None:
        engine = self._engine or get_engine()
        self._engine = engine
        rm = get_resource_manager()
        rm.ensure_hbm(self.hbm_required_gb, for_model="asr")
        # re-derive the quantization switches from config on every load: a
        # reload on a different mesh (TP → single-chip) must re-enable them
        self._cross_kv_bits = self._config_cross_kv_bits()
        self._decoder_qbits = 4 if self.config.decoder_int4 else (
            8 if self.config.decoder_int8 else 0)
        self._lm_head_bits = 4 if (
            self._decoder_qbits == 8
            and getattr(self.config, "lm_head_int4", False)
        ) else None
        self._self_kv_int8 = bool(
            getattr(self.config, "self_kv_int8", False))
        params = self._init_or_restore()
        if self.dtype == jnp.bfloat16:
            # compute_type="bfloat16" means bf16 STORAGE too (faster-whisper's
            # compute_type semantics, reference ``asr/whisper.py:58``): the
            # greedy-decode loop re-reads the whole decoder every step, and
            # fp32 residency doubled those bytes (measured 1.7× RTF)
            params = bf16_storage(params)
        # tensor-parallel placement when the mesh has a model axis (same
        # policy as LLMGenerator): the decode loop's per-token weight read
        # — the memory-bound term capping single-chip ASR MFU — splits
        # across chips, and sharded params free per-chip HBM for a larger
        # window batch. GSPMD propagates the head split into the KV caches.
        spec = None
        if ("model" in engine.mesh.axis_names
                and engine.mesh.shape["model"] > 1):
            from audio_rag_tpu.models.whisper import whisper_param_spec

            spec = whisper_param_spec(self.dims)
            if self._cross_kv_bits or self._decoder_qbits:
                log.info(
                    "whisper TP: disabling int8/int4 paths (Pallas kernels "
                    "are single-device; per-chip HBM traffic is already "
                    "split %d-way)", engine.mesh.shape["model"],
                )
                # hbm_required_gb keeps the q8 increment from __init__ — a
                # small conservative overcount under TP
                self._cross_kv_bits = 0
                self._decoder_qbits = 0
                self._self_kv_int8 = False
        self._params = engine.put_params("whisper", params, spec)
        self._params_q8 = None
        if self._decoder_qbits:
            from audio_rag_tpu.models.whisper import quantize_decoder_weights

            # one-time int8/int4 of the decode-loop weight matmuls
            # (per-layer buffers; see quantize_decoder_weights)
            bits = self._decoder_qbits
            lm_bits = self._lm_head_bits
            self._params_q8 = jax.jit(
                lambda p: quantize_decoder_weights(p, self.dims, bits,
                                                   lm_head_bits=lm_bits)
            )(self._params)
        rm.register_model("asr", self.hbm_required_gb, self)
        self._tokenizer = self._make_text_decoder()

    def _init_or_restore(self):
        if self.config.checkpoint_path:
            from audio_rag_tpu.checkpoint import restore_params

            restored = restore_params(self.config.checkpoint_path, "whisper")
            if restored is not None:
                return restored
            log.warning(
                "checkpoint %s missing whisper params; random init",
                self.config.checkpoint_path,
            )
        if self.config.model_size == "tiny-synth":
            # committed trained asset (scripts/train_asr.py): transcribes
            # the synthetic charvoice — the WER harness / audio-in
            # quality ladder model
            from pathlib import Path

            from audio_rag_tpu.checkpoint import load_npz_asset

            params = load_npz_asset(
                Path(__file__).resolve().parents[1] / "assets"
                / "asr_tiny_synth.npz")
            if params is not None:
                return jax.tree.map(
                    lambda x: jnp.asarray(x, jnp.float32), params)
            log.warning("asr_tiny_synth.npz asset missing; random init")
        if self.dtype == jnp.bfloat16:
            # jit + storage_dtype: stacked bf16 buffers allocated once,
            # fp32 randoms one layer at a time — eager init of large-v3
            # peaks at ~2x fp32 param bytes next to a co-resident LLM
            return jax.jit(
                lambda k: init_whisper(
                    k, self.dims, storage_dtype=jnp.bfloat16)
            )(jax.random.PRNGKey(0))
        return init_whisper(jax.random.PRNGKey(0), self.dims)

    def _unload(self) -> None:
        if self._engine is not None:
            self._engine.drop_params("whisper")
        self._params = None
        self._params_q8 = None
        get_resource_manager().unregister("asr")

    def _make_text_decoder(self):
        self._hf_tokenizer = None
        if self.config.checkpoint_path:
            try:
                from transformers import WhisperTokenizer

                tok = WhisperTokenizer.from_pretrained(
                    self.config.checkpoint_path, local_files_only=True
                )
                self._hf_tokenizer = tok
                return lambda ids: tok.decode(ids, skip_special_tokens=True)
            except Exception:
                pass
        if self.config.model_size == "tiny-synth":
            # char-level codec shared with the TTS symbol table
            from audio_rag_tpu.models.whisper import char_decode

            return char_decode
        # zero-egress fallback: stable readable ids
        return lambda ids: " ".join(f"tok{int(i)}" for i in ids)

    # -- compiled programs -------------------------------------------------
    def _max_new(self) -> int:
        if self.dims.n_text_ctx >= 448:
            cap = MAX_NEW_TOKENS
        elif self.dims.n_text_ctx >= 128:
            # tiny-synth: char-level decoding needs ~most of the text
            # context (a 6 s window holds up to ~110 chars)
            cap = self.dims.n_text_ctx - 16
        else:
            cap = 8  # test presets: keep CPU decode loops short
        if self.config.max_decode_tokens:
            cap = min(cap, self.config.max_decode_tokens)
        return cap

    def _program(self, batch: int, temperature: float = 0.0,
                 prompt_len: int = 4):
        engine = self._engine
        strategy = self.config.decode
        beam = self.config.beam_size
        # conditioned decode carries up to n_text_ctx/2−1 previous tokens
        # in the prompt; new tokens shrink so prompt+decode fit the text
        # context (whisper's own cap — faster-whisper does the same)
        max_new = min(self._max_new(), self.dims.n_text_ctx - prompt_len)
        # conditioning prompts (>16 tokens) skip the speculative path: its
        # priming unrolls per prompt token (a 228-token prompt would be a
        # thousands-of-blocks program through the minutes-per-program
        # relay); plain greedy primes via the layer scan instead
        speculative_k = (self.config.speculative_k
                         if prompt_len <= 16 else 0)

        def build():
            @functools.partial(jax.jit, static_argnames=())
            def run(params, q8, mel, prompt):
                # enc is returned as a DEVICE-RESIDENT output: the word-
                # timestamp alignment pass consumes it directly, so word
                # timestamps don't pay a second full encoder pass
                enc = encode(params, self.dims, mel, dtype=self.dtype)
                if strategy == "beam" and temperature <= 0.0:
                    # beam honors both int8 paths: the cross KV is stored
                    # per GROUP (B rows, beams ride the dot's M dim), so
                    # int8 cross KV costs the same HBM as greedy's
                    toks = beam_decode(
                        params, self.dims, enc, prompt, max_new,
                        self.tokens.eot, beam_size=beam, dtype=self.dtype,
                        decoder_q8=q8,
                        cross_kv_quantize=bool(self._cross_kv_bits),
                        cross_kv_bits=self._cross_kv_bits or 8,
                    )
                    B = toks.shape[0]
                    return (toks, jnp.zeros((B,), jnp.float32),
                            jnp.zeros((B,), jnp.float32), enc)
                if speculative_k > 0 and temperature <= 0.0:
                    # n-gram-drafted block verification: exactly greedy's
                    # output, ≥1 token per weight/cross-KV read
                    from audio_rag_tpu.models.whisper import (
                        speculative_greedy_decode,
                    )

                    toks, lp, nsp = speculative_greedy_decode(
                        params, self.dims, enc, prompt, max_new,
                        self.tokens.eot,
                        spec_k=speculative_k,
                        dtype=self.dtype,
                        no_speech_id=self.tokens.no_speech,
                        cross_kv_quantize=bool(self._cross_kv_bits),
                        cross_kv_bits=self._cross_kv_bits or 8,
                        decoder_q8=q8,
                    )
                    return toks, lp, nsp, enc
                toks, lp, nsp = greedy_decode(
                    params, self.dims, enc, prompt, max_new,
                    self.tokens.eot, dtype=self.dtype,
                    temperature=temperature,
                    rng=jax.random.PRNGKey(int(temperature * 100)),
                    no_speech_id=self.tokens.no_speech,
                    cross_kv_quantize=bool(self._cross_kv_bits),
                    cross_kv_bits=self._cross_kv_bits or 8,
                    decoder_q8=q8,
                    self_kv_int8=self._self_kv_int8,
                )
                return toks, lp, nsp, enc

            def wrapped(params, mel, prompt):
                # q8 rides along as an explicit program argument (a live
                # array captured in a jit closure degrades every later
                # dispatch — CLAUDE.md)
                return run(params, self._params_q8, mel, prompt)

            return wrapped

        # the beam-reorder mode changes the traced program (env read at
        # trace time inside beam_decode) — key it so an env flip within
        # one process can't hit a stale cached program
        beam_mode = (os.environ.get("BEAM_REORDER", "lazy")
                     if strategy == "beam" else None)
        return engine.program(
            ("whisper", "transcribe", self.config.model_size, strategy,
             batch, temperature,
             max_new, self._cross_kv_bits,
             self._decoder_qbits, self._lm_head_bits,
             self._self_kv_int8,
             speculative_k, prompt_len, beam_mode), build
        )

    def _mel_for_batch(self, win: np.ndarray, contiguous: bool) -> jax.Array:
        """Window-batch log-mel → (B, n_mels, T).

        When the mesh has >1 data device and the batch's windows are
        time-contiguous, the whole span computes as ONE time-axis-sharded
        program (``ops/mel.log_mel_sharded``: halo exchange + global
        max−8 clamp) and is sliced into windows on device — the SURVEY
        §2.4 long-audio path, with per-chip peak memory ∝ span/n_data.
        It also matches upstream Whisper more closely than per-window
        mel: openai/whisper computes one full-file mel and slices it, so
        frames are continuous across window joins and the clamp is
        global. Otherwise (single data device, VAD-gapped batches) the
        batched per-window program runs, identical to before.
        """
        B, n = win.shape
        T = n // HOP_LENGTH
        mesh = getattr(self._engine, "mesh", None)
        n_data = int(mesh.shape.get("data", 1)) if mesh is not None else 1
        if (self.config.mel_sharded and contiguous and n_data > 1
                and (B * T) % n_data == 0):
            from audio_rag_tpu.ops.mel import log_mel_sharded

            m = log_mel_sharded(win.reshape(-1), n_mels=self.dims.n_mels,
                                mesh=mesh)  # (n_mels, B*T), frame-sharded
            return m.reshape(self.dims.n_mels, B, T).transpose(1, 0, 2)
        return log_mel_batch(jnp.asarray(win), n_mels=self.dims.n_mels)

    def _place_batch(self, mel_batch: np.ndarray, prompt: np.ndarray):
        """Shard the window batch over the mesh's data axis when possible.

        This is the SURVEY §5 long-audio strategy: Whisper windows are
        independent, so an hour of audio processes as batch-parallel
        windows across chips — the context-parallel analog without halo
        exchanges. Falls back to single-device placement.
        """
        try:
            from jax.sharding import NamedSharding, PartitionSpec as P

            mesh = self._engine.mesh
            n_data = mesh.shape.get("data", 1)
            if n_data > 1 and mel_batch.shape[0] % n_data == 0:
                mel_s = NamedSharding(mesh, P("data", None, None))
                pr_s = NamedSharding(mesh, P("data", None))
                return (jax.device_put(mel_batch, mel_s),
                        jax.device_put(prompt, pr_s))
        except Exception:
            pass
        return jnp.asarray(mel_batch), jnp.asarray(prompt)

    # -- public API --------------------------------------------------------
    @timed
    def transcribe(
        self,
        audio: np.ndarray | str,
        sample_rate: int | None = None,
        word_timestamps: bool = False,
        language: str | None = None,
        **kw: Any,
    ) -> list[TranscriptSegment]:
        self.require_loaded()
        get_resource_manager().touch("asr")
        wav, sr = decode_audio(audio, sample_rate)
        if wav.size == 0:
            return []

        # VAD gate: transcribe only speech spans (batched windows keep
        # absolute offsets so timestamps stay file-relative)
        if self.config.vad_filter:
            spans = speech_segments(wav, sr, VADOptions(
                backend=self.config.vad_backend,
                threshold=self.config.vad_threshold,
            ))
            if not spans:
                return []
        else:
            spans = [(0.0, len(wav) / sr)]

        # window span follows the MODEL's audio context (== N_SAMPLES/30 s
        # for the real sizes; shorter for the test preset, so tests
        # exercise the same multi-window batching as production)
        window_s = 2 * self.dims.n_audio_ctx * HOP_LENGTH / SAMPLE_RATE
        # slice on INTEGER sample indices: float-seconds arithmetic
        # truncates (int(1.2 * 16000) == 19199), producing windows one
        # sample short of full — which silently fails the contiguity
        # check below and drops the time-axis-sharded mel path
        step = int(round(window_s * sr))
        windows: list[tuple[float, np.ndarray]] = []
        for s, e in spans:
            s_idx, e_idx = int(round(s * sr)), int(round(e * sr))
            for start in range(s_idx, e_idx, step):
                seg = wav[start: min(start + step, e_idx)]
                if seg.size >= int(0.2 * sr):  # skip sub-200ms tails
                    windows.append((start / sr, seg))
        if not windows:
            return []

        lang = language or self.config.language
        lang_offset = 0
        if lang:
            from audio_rag_tpu.models.whisper import language_offset

            try:
                lang_offset = language_offset(lang)
            except ValueError:
                log.warning("unknown language %r; defaulting to en", lang)
                lang = "en"
        elif self.dims.n_vocab >= 51865:
            # auto-detect from the first window (faster-whisper behavior
            # when no language is given); one extra cached program
            lang_offset, prob = self.detect_language(wav[: N_SAMPLES], sr)
            from audio_rag_tpu.models.whisper import WHISPER_LANGUAGES

            lang = WHISPER_LANGUAGES[lang_offset]
            log.info("detected language %s (p=%.2f)", lang, prob)
        else:
            lang = "en"

        if self.config.condition_on_previous_text:
            # faster-whisper's default conditioning chains each window's
            # prompt on the previous window's output — inherently
            # sequential, so the window batch degrades to 1. Parity mode,
            # not the speed profile (docs/PERFORMANCE.md).
            segments = self._transcribe_conditioned(
                windows, lang, lang_offset, want_words=word_timestamps)
            if word_timestamps:
                for seg in segments:
                    if not seg.words:
                        seg.words = _interpolate_words(seg)
            return segments

        segments: list[TranscriptSegment] = []
        bs = self.config.window_batch_size
        # multi-batch files pad the tail batch to the FULL batch size: a
        # partial-B program is a fresh shape, and the unrolled transcribe
        # program costs ~350 s of pure trace/lower per process even on a
        # persistent-cache hit (measured: a 60-min file's 8-window tail
        # regressed the whole ingest from ~60 s to 455 s). Decoding a few
        # zero windows is ~free — the decode loop is weight-read bound and
        # the reads are shared across the batch. Single-batch files (the
        # streaming path's 1-window chunks) keep their natural shape.
        pad_to = bs if len(windows) > bs else None
        for i in range(0, len(windows), bs):
            chunk = windows[i: i + bs]
            segments.extend(
                self._transcribe_batch(chunk, lang,
                                       want_words=word_timestamps,
                                       lang_offset=lang_offset,
                                       pad_to=pad_to)
            )

        if word_timestamps:
            for seg in segments:
                if not seg.words:
                    seg.words = _interpolate_words(seg)
        return segments

    def transcribe_with_words(
        self, audio: np.ndarray | str, sample_rate: int | None = None, **kw
    ) -> list[TranscriptSegment]:
        return self.transcribe(audio, sample_rate, word_timestamps=True, **kw)

    @timed
    def transcribe_chunk_batch(
        self,
        chunks: list[np.ndarray],
        sample_rate: int | None = None,
        word_timestamps: bool = False,
        language: str | None = None,
        pad_to: int | None = None,
        **kw: Any,
    ) -> list[list[TranscriptSegment]]:
        """N independent ≤1-window chunks as ONE batched device dispatch.

        The streaming-mux path (:mod:`audio_rag_tpu.asr.mux`): concurrent
        live sessions' chunks ride the same window-batch program the file
        path compiles, so the decode loop's weight reads — the memory
        -bound term that caps per-chunk latency — amortize across
        sessions. Timestamps are chunk-relative (the session wrapper
        re-offsets). Returns one segment list per chunk; empty where the
        VAD gate or the no-speech gate dropped it.

        Parity with per-chunk :meth:`transcribe`: rows are the VAD speech
        spans (sliced, offset-carrying, window-split — the decoder never
        sees leading/trailing non-speech), and an unset language
        auto-detects on multilingual models. Two documented deltas:

        * **bounded program set**: when span-splitting would emit more
          rows than ``pad_to`` (a mid-chunk pause, or a chunk longer than
          one model window), each chunk collapses to its span envelope
          truncated to one window instead of compiling a fresh batch
          bucket mid-serving;
        * an unset language **detects per row in ONE batched dispatch**
          (:meth:`detect_language_rows`) — rows are different sessions'
          audio, and the prompt is a runtime array, so per-row language
          tokens ride the same compiled transcribe program.
        """
        self.require_loaded()
        get_resource_manager().touch("asr")
        outs: list[list[TranscriptSegment]] = [[] for _ in chunks]
        wavs = [decode_audio(c, sample_rate)[0] for c in chunks]
        if self.config.vad_filter:
            # gate all chunks in ONE stacked VAD dispatch set — per-chunk
            # calls would serialize N ~30 ms interactions on the mux thread
            from audio_rag_tpu.asr.vad import speech_segments_batch

            all_spans = speech_segments_batch(
                wavs, SAMPLE_RATE, VADOptions(
                    backend=self.config.vad_backend,
                    threshold=self.config.vad_threshold,
                ))
        else:
            all_spans = [[(0.0, len(w) / SAMPLE_RATE)] if len(w) else []
                         for w in wavs]
        step = 2 * self.dims.n_audio_ctx * HOP_LENGTH  # one model window

        def build(spans_per_chunk):
            ws: list[tuple[float, np.ndarray]] = []
            ix: list[int] = []
            for k, (wav, spans) in enumerate(zip(wavs, spans_per_chunk)):
                for s, e in spans:
                    # window-split each span exactly like transcribe() so
                    # the two paths emit identical rows
                    s_idx = int(round(s * SAMPLE_RATE))
                    e_idx = min(int(round(e * SAMPLE_RATE)), len(wav))
                    for start in range(s_idx, e_idx, step):
                        seg = wav[start: min(start + step, e_idx)]
                        if seg.size >= int(0.2 * SAMPLE_RATE):  # <200ms
                            ws.append((start / SAMPLE_RATE, seg))
                            ix.append(k)
            return ws, ix

        windows, idx = build(all_spans)
        if pad_to and len(windows) > pad_to:
            # bounded program set: more rows than the warmed bucket (a
            # mid-chunk pause split a chunk into 2+ spans, or a chunk
            # exceeded one window) would compile a FRESH program mid-
            # serving — minutes through the relay, stalling every live
            # session. Collapse each chunk to its span ENVELOPE truncated
            # to one model window: edge non-speech is still stripped and
            # the offset stays true; only mid-chunk silence re-enters the
            # decoder.
            window_s = step / SAMPLE_RATE
            envel = [[(s[0][0], min(s[-1][1], s[0][0] + window_s))]
                     if s else [] for s in all_spans]
            windows, idx = build(envel)
        if not windows:
            return outs
        from audio_rag_tpu.models.whisper import language_offset

        # language may be per CHUNK (muxed sessions with different
        # sticky languages share one dispatch — the prompt is a runtime
        # array, so per-row language tokens ride the same program)
        if isinstance(language, list):
            chunk_langs = [l or self.config.language for l in language]
        else:
            chunk_langs = [language or self.config.language] * len(chunks)
        row_langs: list[str | None] = [chunk_langs[k] for k in idx]
        offs = [0] * len(windows)
        to_detect: list[int] = []
        for j, l in enumerate(row_langs):
            if l:
                try:
                    offs[j] = language_offset(l)
                except ValueError:
                    log.warning("unknown language %r; defaulting to en", l)
                    row_langs[j] = "en"
            else:
                to_detect.append(j)
        if to_detect:
            if self.dims.n_vocab >= 51865:
                # auto-detect PER ROW in one batched dispatch — rows are
                # different sessions' audio, and a single batch-wide
                # detection would let one session's language stick to
                # another session permanently (transcribe() parity per
                # row). pad_to keeps the detect program bucket warmed.
                from audio_rag_tpu.models.whisper import WHISPER_LANGUAGES

                det = self.detect_language_rows(
                    [windows[j][1] for j in to_detect],
                    pad_to=pad_to if pad_to and pad_to >= len(to_detect)
                    else None)
                for j, o in zip(to_detect, det):
                    offs[j] = o
                    row_langs[j] = WHISPER_LANGUAGES[o]
                log.info("detected languages %s",
                         sorted({row_langs[j] for j in to_detect}))
            else:
                for j in to_detect:
                    row_langs[j] = "en"
        lang: str | list[str]
        lang_offset: int | list[int]
        if len(set(row_langs)) == 1:
            lang, lang_offset = row_langs[0], offs[0]
        else:
            lang, lang_offset = list(row_langs), offs
        # batch bucket: the live-session count varies per dispatch and
        # program identity includes B (a fresh shape costs a fresh
        # trace+compile — minutes for the real sizes). Callers that want
        # a fixed program set pass pad_to (the mux uses {1, max_batch}:
        # pad rows are ~free since the decode loop is weight-read-bound
        # and the reads are shared across rows); default is pow-2.
        if pad_to and pad_to >= len(windows):
            B = pad_to
        else:
            B = 1 << (len(windows) - 1).bit_length()
        per = self._transcribe_batch(
            windows, lang, want_words=word_timestamps,
            lang_offset=lang_offset, pad_to=B, grouped=True,
        )
        for k, segs in zip(idx, per):
            if word_timestamps:
                for seg in segs:
                    if not seg.words:
                        seg.words = _interpolate_words(seg)
            outs[k].extend(segs)  # k repeats when a chunk has 2+ spans
        return outs

    def detect_language(
        self, audio: np.ndarray | str, sample_rate: int | None = None
    ) -> tuple[int, float]:
        """(language offset from <|en|>, probability) for the first window
        (faster-whisper detect_language parity)."""
        from audio_rag_tpu.models.whisper import detect_language, encode

        self.require_loaded()
        wav, _ = decode_audio(audio, sample_rate)
        n = 2 * self.dims.n_audio_ctx * HOP_LENGTH
        window = np.zeros(n, np.float32)
        window[: min(len(wav), n)] = wav[:n]
        mel = log_mel_spectrogram(
            jnp.asarray(window), n_mels=self.dims.n_mels
        )[None]

        def build():
            @jax.jit
            def run(params, mel):
                enc = encode(params, self.dims, mel, dtype=self.dtype)
                return detect_language(params, self.dims, enc,
                                       self.tokens, self.dtype)

            return run

        run = self._engine.program(
            ("whisper", "lang", self.config.model_size), build)
        lang, prob = run(self._params, mel)
        return int(np.asarray(lang)[0]), float(np.asarray(prob)[0])

    def detect_language_rows(
        self, rows: list[np.ndarray], pad_to: int | None = None
    ) -> list[int]:
        """Per-row language offsets for N audio rows in ONE dispatch.

        The muxed-batch path: concurrent sessions' first chunks share a
        batch, and each row must detect on ITS OWN audio — a single
        detection applied batch-wide would let one session's language
        stick to another session permanently. Mel is computed in-program
        (the single-row :meth:`detect_language` pays a bare-op mel
        dispatch; here one dispatch covers mel+encode+detect for all
        rows). ``pad_to`` buckets the batch like the transcribe program
        so the compiled set stays {1, max}."""
        self.require_loaded()
        from audio_rag_tpu.models.whisper import detect_language, encode

        n = 2 * self.dims.n_audio_ctx * HOP_LENGTH
        R = len(rows)
        B = pad_to if pad_to and pad_to >= R else 1 << (R - 1).bit_length()
        clips = np.zeros((B, n), np.float32)
        for j, w in enumerate(rows):
            clips[j, : min(len(w), n)] = w[:n]

        def build():
            @jax.jit
            def run(params, clips):
                mel = jax.vmap(
                    lambda a: log_mel_spectrogram(a, n_mels=self.dims.n_mels)
                )(clips)
                enc = encode(params, self.dims, mel, dtype=self.dtype)
                return detect_language(params, self.dims, enc,
                                       self.tokens, self.dtype)

            return run

        run = self._engine.program(
            ("whisper", "langrows", self.config.model_size), build)
        lang, _prob = run(self._params, jnp.asarray(clips))
        return [int(v) for v in np.asarray(lang)[:R]]

    # -- internals ---------------------------------------------------------
    def _prompt_buckets(self) -> list[int]:
        """Allowed previous-context lengths. Static shapes mean every
        distinct prompt length is a distinct compiled program, so the
        context truncates DOWN to one of these instead of using its exact
        length (faster-whisper uses exact lengths; the deviation is only
        in how much context conditions the window, never in its
        content). Steady state on real speech accumulates > cap tokens
        within a window or two, so the full-cap bucket — exact
        faster-whisper semantics — dominates."""
        cap = self.dims.n_text_ctx // 2 - 1  # faster-whisper's prompt cap
        return sorted({b for b in (4, 8, 16, 32, 64, 128, cap) if b <= cap})

    def _transcribe_conditioned(
        self, windows: list[tuple[float, np.ndarray]],
        lang: str, lang_offset: int, want_words: bool,
    ) -> list[TranscriptSegment]:
        """faster-whisper's ``condition_on_previous_text`` semantics
        (openai/whisper ``transcribe()`` — the default the reference
        inherits at ``asr/whisper.py:120-126``):

        * each window's prompt = ``<|startofprev|>`` + the accumulated
          decoded tokens since the last reset (truncated to the last
          n_text_ctx/2−1, here bucketed — see :meth:`_prompt_buckets`)
          + the normal SOT sequence;
        * every window's decoded tokens (text + timestamp) append to the
          history;
        * a window whose final decode temperature exceeds
          ``prompt_reset_on_temperature`` RESETS the history — the next
          window starts unconditioned (a low-quality window must not
          poison the following prompt).

        Windows decode sequentially (window k's prompt needs k−1's
        output) — the reference pays the same serialization inside
        CTranslate2; our batched unconditioned mode is the speed
        profile. Long prompts prime through the decoder layer scan, not
        per-token unrolling (models/whisper.py greedy_decode long-prompt
        path), so the compiled-program set stays small.
        """
        cap = self.dims.n_text_ctx // 2 - 1
        buckets = self._prompt_buckets()
        history: list[int] = []
        reset_since = 0
        segments: list[TranscriptSegment] = []
        for t0, seg in windows:
            prev = history[reset_since:][-cap:]
            prev_ids: list[int] | None = None
            if prev:
                b = max((b for b in buckets if b <= len(prev)),
                        default=None)
                if b:
                    prev_ids = prev[-b:]
            per_window, meta = self._transcribe_batch(
                [(t0, seg)], lang, want_words=want_words,
                lang_offset=lang_offset, prev_ids=prev_ids,
                return_meta=True,
            )
            segments.extend(per_window[0])
            history.extend(meta["clean_ids"][0])
            if float(meta["final_temp"][0]) > \
                    self.config.prompt_reset_on_temperature:
                reset_since = len(history)
        return segments

    def _transcribe_batch(
        self, windows: list[tuple[float, np.ndarray]],
        lang: str | list[str],
        want_words: bool = False, lang_offset: int | list[int] = 0,
        pad_to: int | None = None, grouped: bool = False,
        prev_ids: list[int] | None = None,
        return_meta: bool = False,
    ) -> Any:
        """``lang``/``lang_offset`` may be per-row lists (muxed chunk
        batches: concurrent sessions can speak different languages; the
        prompt is a runtime array, so per-row language tokens reuse the
        same compiled program).

        ``prev_ids`` (single-window conditioned mode only) prepends
        ``<|startofprev|> + prev_ids`` to the SOT sequence — the
        faster-whisper conditioning prompt. ``return_meta`` additionally
        returns ``{"clean_ids", "final_temp"}`` so the conditioned
        caller can maintain its token history and apply the
        reset-on-temperature rule."""
        n_real = len(windows)
        langs = lang if isinstance(lang, list) else [lang] * n_real
        offsets = (lang_offset if isinstance(lang_offset, list)
                   else [lang_offset] * n_real)
        B = max(pad_to or 0, n_real)  # zero-window rows pad the tail batch
        n_mel_samples = (
            2 * self.dims.n_audio_ctx * HOP_LENGTH
        )  # 30 s for real models, shorter for the test preset
        win = np.zeros((B, n_mel_samples), np.float32)
        for j, (_, seg) in enumerate(windows):
            win[j, : min(len(seg), n_mel_samples)] = seg[:n_mel_samples]
        # contiguous ⇔ every non-final REAL window is full-length and starts
        # exactly one window after its predecessor (rows of `win`
        # concatenate back to the original span) — the condition for the
        # time-axis-sharded mel to be exact. Zero-pad rows extend the span
        # with silence, which is the file's true continuation at its end.
        window_s = n_mel_samples / SAMPLE_RATE
        contiguous = all(
            abs((windows[j + 1][0] - windows[j][0]) - window_s) < 1e-3
            and len(windows[j][1]) >= n_mel_samples
            for j in range(n_real - 1)
        )
        # ONE device program for the whole batch's mel; the result stays on
        # device and feeds the transcribe program directly (the old
        # per-window loop paid a host↔device round trip per 30 s window)
        mel_batch = self._mel_for_batch(win, contiguous)

        st = self.tokens
        sot_seq = [st.sot, st.lang_base, st.transcribe, st.no_timestamps]
        if prev_ids:
            assert B == 1, "conditioned prompts run single-window"
            prompt = np.array([[st.sot_prev, *prev_ids, *sot_seq]],
                              np.int32)
        else:
            prompt = np.tile(np.array([sot_seq], np.int32), (B, 1))
        P = prompt.shape[1]
        for j in range(n_real):  # per-row language tokens (pad rows: en)
            prompt[j, P - 3] = st.lang_base + offsets[j]
        mel_j, prompt_j = self._place_batch(mel_batch, prompt)
        out = self._program(B, prompt_len=P)(self._params, mel_j, prompt_j)
        tokens = np.array(out[0])  # writable copies (fallback ladder mutates)
        avg_lp = np.array(out[1])
        no_speech = np.asarray(out[2])
        enc_dev = out[3]  # stays on device; only the align pass reads it

        # temperature-fallback ladder (faster-whisper semantics,
        # reference asr/whisper.py temperature tuple): a window retries at
        # the next temperature while EITHER quality gate fails — avg logprob
        # below threshold OR decoded text gzip-compresses better than
        # compression_ratio_threshold (the signature of a repetition loop,
        # which has HIGH logprob and so needs its own gate). Each retry's
        # result REPLACES the failing window unconditionally, so windows
        # that never pass keep the highest-temperature attempt (reference
        # behavior) instead of being stuck with a confident repetition. The
        # full batch reruns (static shapes); only failing rows update, and
        # rows that pass leave the ladder.
        final_temp = np.zeros(B, np.float32)
        if self.config.temperature_fallback and self.config.decode == "greedy":
            failed = self._gates_failed(tokens, avg_lp, prompt_len=P)
            for temp in self.config.fallback_temperatures:
                if not failed.any():
                    break
                out_t = self._program(B, float(temp), prompt_len=P)(
                    self._params, mel_j, prompt_j
                )
                t_tokens = np.asarray(out_t[0])
                t_lp = np.asarray(out_t[1])
                tokens[failed] = t_tokens[failed]
                avg_lp[failed] = t_lp[failed]
                final_temp[failed] = temp
                failed = failed & self._gates_failed(tokens, avg_lp,
                                                     prompt_len=P)

        # no-speech gate: Whisper drops windows where p(no_speech) is high
        # AND the transcript is low-confidence
        silent = (no_speech > self.config.no_speech_threshold) & (
            avg_lp < self.config.logprob_threshold
        )

        # optional: one teacher-forced pass collecting cross-attention for
        # DTW word timestamps (faster-whisper parity; asr/word_timing.py)
        window_weights = None
        clean_per_window: list[list[int]] = []
        if want_words:
            for j in range(B):
                # pad rows keep an empty token list (length-B lists keep the
                # align program's shapes, but junk decodes of the silent pad
                # rows must not inflate the pow-2 token bucket)
                ids = self._strip_special(tokens[j], P) if j < n_real else []
                clean_per_window.append(
                    [i for i in ids if i < self.tokens.timestamp_base]
                )
            window_weights = self._collect_cross_weights(
                enc_dev, prompt, clean_per_window
            )

        per_window: list[list[TranscriptSegment]] = []
        clean_ids_out: list[list[int]] = []
        for j, (t0, seg_audio) in enumerate(windows):
            text_ids = self._strip_special(tokens[j], P)
            clean_ids_out.append([] if silent[j] else text_ids)
            if silent[j]:
                per_window.append([])  # whisper's no-speech gate
                continue
            dur = len(seg_audio) / SAMPLE_RATE
            segs = self._tokens_to_segments(text_ids, t0, dur, langs[j])
            for s in segs:
                s.avg_logprob = round(float(avg_lp[j]), 4)
            if want_words and window_weights is not None and segs:
                self._apply_word_times(
                    segs, window_weights[j], clean_per_window[j], dur, t0,
                    prompt_len=P,
                )
            per_window.append(segs)
        if return_meta:
            meta = {"clean_ids": clean_ids_out, "final_temp": final_temp}
            return per_window, meta
        if grouped:
            return per_window
        return [s for segs in per_window for s in segs]

    def _collect_cross_weights(
        self, enc_dev, prompt: np.ndarray,
        clean_per_window: list[list[int]],
    ) -> np.ndarray | None:
        """Teacher-forced decoder pass over the ALREADY-computed encoder
        states (device-resident output of the transcribe program — reusing
        them halves per-chunk encoder work for word-timestamped streaming)
        → head-averaged (B, T, Ta) fp32 weights."""
        from audio_rag_tpu.models.whisper import (
            decoder_forward,
            precompute_cross_kv,
        )

        max_t = max((len(c) for c in clean_per_window), default=0)
        if max_t == 0:
            return None
        # pow-2 bucket: token counts vary per batch, and a fresh shape means
        # a fresh compile — fatal for streaming (one compile per chunk)
        max_t = 1 << (max_t - 1).bit_length()
        max_t = min(max_t, self.dims.n_text_ctx - prompt.shape[1])
        P = prompt.shape[1]
        B = len(clean_per_window)
        tf_tokens = np.full((B, P + max_t), self.tokens.eot, np.int32)
        tf_tokens[:, :P] = prompt
        for j, c in enumerate(clean_per_window):
            c = c[:max_t]
            tf_tokens[j, P: P + len(c)] = c

        def build():
            @jax.jit
            def run(params, enc, toks):
                ckv = precompute_cross_kv(params, self.dims, enc, self.dtype)
                # "alignment_mean" accumulates the upper-half-layer,
                # head-averaged statistic IN the layer scan → (B, T, Ta).
                # Stacking the raw (L, B, H, T, Ta) tensor and reducing
                # after (the previous form) is ~70 GB at window batch 16
                # and crashed the compile backend; per-window it was
                # ~1 GB and froze streaming when transferred.
                _, _, w = decoder_forward(
                    params, self.dims, toks, ckv, dtype=self.dtype,
                    collect_cross_weights="alignment_mean",
                )
                # fp16 readback: halves the (B, T, Ta) transfer (25 MB at
                # batch 16 — the relay charges seconds for tens-of-MB
                # operands, CLAUDE.md). Attention probs are [0, 1];
                # word-boundary effect is sub-frame (DTW re-normalizes
                # per frame in fp32 host-side).
                return w.astype(jnp.float16)

            return run

        run = self._engine.program(
            ("whisper", "align", self.config.model_size, B, P + max_t), build
        )
        return np.asarray(
            run(self._params, enc_dev, jnp.asarray(tf_tokens))
        ).astype(np.float32)  # (B, T, Ta)

    def _apply_word_times(
        self, segs: list[TranscriptSegment], weights: np.ndarray,
        clean_ids: list[int], dur: float, t0: float,
        prompt_len: int = 4,
    ) -> None:
        from audio_rag_tpu.asr.word_timing import attention_to_word_times

        if not clean_ids:
            return
        P = prompt_len
        # token → word map: with the id-map fallback every token is a word;
        # HF tokenizers start a word at a leading-space piece
        token_word = self._token_word_map(clean_ids)
        # weights: (T, Ta), already layer/head-averaged on device
        tok_slice = weights[P: P + len(clean_ids), :]
        n_frames = min(int(dur / 0.02), tok_slice.shape[-1])
        times = attention_to_word_times(
            tok_slice, token_word, max(n_frames, 1), time_offset=t0
        )
        # distribute word times across this window's segments in order
        cursor = 0
        for seg in segs:
            words_text = seg.text.split()
            seg_times = times[cursor: cursor + len(words_text)]
            cursor += len(words_text)
            seg.words = [
                Word(text=w, start=s, end=e, speaker=seg.speaker)
                for w, (s, e) in zip(words_text, seg_times)
            ]
            if seg.words:
                seg.start = min(seg.start, seg.words[0].start)
                seg.end = max(seg.end, seg.words[-1].end)

    def _token_word_map(self, ids: list[int]) -> list[int]:
        hf = getattr(self, "_hf_tokenizer", None)
        if hf is not None:
            out, wid = [], -1
            pieces = hf.convert_ids_to_tokens(ids)
            for p in pieces:
                if wid < 0 or p.startswith(("Ġ", "▁", " ")):
                    wid += 1
                out.append(wid)
            return out
        return list(range(len(ids)))  # fallback: token == word

    def _gates_failed(self, tokens: np.ndarray, avg_lp: np.ndarray,
                      prompt_len: int = 4) -> np.ndarray:
        """Per-window bool mask: True where a quality gate trips
        (low avg logprob OR repetition-loop compression ratio)."""
        failed = avg_lp < self.config.logprob_threshold
        thr = self.config.compression_ratio_threshold
        if thr:
            for j in range(tokens.shape[0]):
                if failed[j]:
                    continue
                text = self._tokenizer([
                    i for i in self._strip_special(tokens[j], prompt_len)
                    if i < self.tokens.timestamp_base
                ])
                if _compression_ratio(text) > thr:
                    failed[j] = True
        return failed

    def _strip_special(self, ids: np.ndarray,
                       prompt_len: int = 4) -> list[int]:
        """Drop the prompt and control tokens; keep text + timestamp tokens.

        Control ids occupy [eot, timestamp_base); timestamp tokens are
        >= timestamp_base (kept — they delimit segments); everything else
        is text. Holds for the real vocab (controls 50257+) and the
        test/tiny-synth presets (controls at v-9..v-2, sot_prev included
        — SpecialTokens.for_dims). ``prompt_len`` covers conditioned
        prompts (``<|startofprev|>`` + previous tokens + SOT sequence).
        """
        st = self.tokens
        keep: list[int] = []
        for i in ids.tolist()[prompt_len:]:  # skip the prompt
            if i == st.eot:
                break
            if st.eot <= i < st.timestamp_base:
                continue  # control token
            keep.append(i)
        return keep

    def _tokens_to_segments(
        self, ids: list[int], t0: float, dur: float, lang: str
    ) -> list[TranscriptSegment]:
        """Split on timestamp-token pairs when present, else one segment."""
        st = self.tokens
        segs: list[tuple[float, float, list[int]]] = []
        cur_start: float | None
        cur: list[int]
        cur_start, cur = None, []
        for i in ids:
            if i >= st.timestamp_base:
                ts = (i - st.timestamp_base) * 0.02
                if cur_start is None:
                    cur_start = ts
                else:
                    segs.append((cur_start, ts, cur))
                    cur_start, cur = None, []
            else:
                cur.append(i)
        if cur:
            segs.append((cur_start or 0.0, dur, cur))
        if not segs:
            return []
        out = []
        for s, e, toks in segs:
            if not toks:
                continue
            text = self._tokenizer(toks).strip()
            if not text:
                continue
            out.append(
                TranscriptSegment(
                    text=text,
                    start=round(t0 + s, 3),
                    end=round(t0 + min(e, dur), 3),
                    language=lang,
                )
            )
        return out


def _compression_ratio(text: str) -> float:
    """gzip compression ratio of decoded text (Whisper's repetition gate):
    raw bytes / compressed bytes; loops compress far better than speech."""
    import zlib

    data = text.encode("utf-8")
    if not data:
        return 0.0
    return len(data) / len(zlib.compress(data))


def _interpolate_words(seg: TranscriptSegment) -> list[Word]:
    """Evenly distribute word timings inside a segment (fallback when DTW
    timestamps are unavailable — same interpolation the reference's fixed
    chunker applies at ``chunking/fixed.py:60-80``)."""
    parts = seg.text.split()
    if not parts:
        return []
    step = seg.duration / len(parts)
    return [
        Word(
            text=w,
            start=round(seg.start + k * step, 3),
            end=round(seg.start + (k + 1) * step, 3),
            speaker=seg.speaker,
        )
        for k, w in enumerate(parts)
    ]
