"""On-mesh LLM generator backend.

Parity surface: reference ``generation/ollama.py:16-146`` (OllamaGenerator:
generate / generate_stream / check_availability with fallback models) — but
the model runs in-process on the TPU mesh instead of over HTTP to an Ollama
server, with tensor-parallel param sharding when the mesh has a model axis.
"""

from __future__ import annotations

from typing import Iterable

import jax
import jax.numpy as jnp
import numpy as np

from audio_rag_tpu.config.schema import GenerationConfig
from audio_rag_tpu.core.base import BaseGenerator
from audio_rag_tpu.core.exceptions import GenerationError
from audio_rag_tpu.engine.engine import bf16_storage, get_engine
from audio_rag_tpu.generation.base import GeneratorRegistry
from audio_rag_tpu.models.llm import (
    LLM_PRESETS,
    LLMDims,
    init_llm,
    llm_generate,
    llm_param_spec,
)
from audio_rag_tpu.resources.manager import get_resource_manager
from audio_rag_tpu.text.tokenizer import get_tokenizer
from audio_rag_tpu.utils.decorators import timed
from audio_rag_tpu.utils.logging import get_logger

log = get_logger(__name__)

__all__ = ["LLMGenerator"]

HBM_BY_MODEL = {"llama-3.2-1b": 3.0, "llama-3.2-3b": 7.0, "test": 0.05,
                "eval-small": 0.05}


@GeneratorRegistry.register("llm-jax")
class LLMGenerator(BaseGenerator):
    def __init__(self, config: GenerationConfig | None = None):
        super().__init__()
        self.config = config or GenerationConfig()
        name = self.config.model if self.config.model in LLM_PRESETS \
            else "llama-3.2-3b"
        self.dims: LLMDims = LLM_PRESETS[name]
        self.hbm_required_gb = HBM_BY_MODEL.get(name, 7.0)
        # decode-loop weight quantization width: int4 > int8 > off;
        # lm_head_int4 narrows just the vocab projection (mixed profile)
        self._decoder_qbits = 4 if self.config.decoder_int4 else (
            8 if self.config.decoder_int8 else 0)
        self._lm_head_bits = 4 if (
            self._decoder_qbits and getattr(self.config, "lm_head_int4",
                                            False)) else None
        if self._decoder_qbits:
            # quantized weight copies coexist with the bf16 params —
            # account for them so the ResourceManager budget stays honest
            from audio_rag_tpu.models.llm import q8_param_bytes

            self.hbm_required_gb += q8_param_bytes(
                self.dims, self._decoder_qbits, self._lm_head_bits) / 1e9
        self._params = None
        self._params_q8 = None
        self._tok = None
        self.last_token_counts: list[int] = []
        self.last_token_ids: list[list[int]] = []
        self.last_spec_stats: dict | None = None
        #: jitted wave/speculative programs keyed on static scalars
        #: (shape/bucket variation is jit's own trace cache); kept across
        #: unload/reload — re-tracing is the expensive part, params are
        #: explicit args
        self._gen_programs: dict[tuple, object] = {}

    def _gen_program(self, kind: str, max_new: int, eos_id: int,
                     knob: float | int):
        """Cached jit of the wave (knob=temperature) or speculative
        (knob=spec_k) generate loop — see generate_batch's comment."""
        import functools

        key = (kind, self.dims.d_model, self.dims.n_layers, max_new,
               eos_id, knob)
        fn = self._gen_programs.get(key)
        if fn is None:
            if kind == "spec":
                from audio_rag_tpu.models.llm import llm_speculative_generate

                fn = jax.jit(functools.partial(
                    llm_speculative_generate, dims=self.dims,
                    max_new_tokens=max_new, eos_id=eos_id,
                    spec_k=int(knob), return_stats=True))
            else:
                fn = jax.jit(functools.partial(
                    llm_generate, dims=self.dims, max_new_tokens=max_new,
                    eos_id=eos_id, temperature=float(knob)))
            self._gen_programs[key] = fn
        return fn

    def _load(self) -> None:
        engine = self._engine or get_engine()
        self._engine = engine
        rm = get_resource_manager()
        rm.ensure_hbm(self.hbm_required_gb, for_model="generation")
        params = None
        if self.config.checkpoint_path:
            from audio_rag_tpu.checkpoint import restore_params

            params = restore_params(self.config.checkpoint_path, "llm")
        if params is None and self.config.model == "eval-small":
            # committed trained tiny generator (scripts/train_llm.py)
            from pathlib import Path

            from audio_rag_tpu.checkpoint import load_npz_asset

            params = load_npz_asset(
                Path(__file__).resolve().parents[1] / "assets"
                / "llm_small.npz")
            if params is not None:
                params = jax.tree.map(
                    lambda x: jnp.asarray(x, jnp.float32), params)
            else:
                log.warning("llm_small.npz asset missing; random init")
        if params is None:
            # jit + storage_dtype: the stacked bf16 buffers are allocated
            # once and the fp32 randoms exist one layer at a time. Eager
            # fp32 init of llama-3.2-3b peaks ~26 GB (params + stack
            # transient) and OOMs the 16 GB chip when the ResourceManager
            # swaps the LLM in mid-ingest for contextual headers.
            params = jax.jit(
                lambda k: init_llm(k, self.dims, storage_dtype=jnp.bfloat16)
            )(jax.random.PRNGKey(0))
        # bf16 STORAGE: halves the bytes the decode loop re-reads per token
        # and the HBM footprint (see engine.bf16_storage)
        params = bf16_storage(params)
        # tensor-parallel placement when the mesh has a model axis
        spec = llm_param_spec(self.dims) if (
            "model" in engine.mesh.axis_names
            and engine.mesh.shape["model"] > 1
        ) else None
        self._params = engine.put_params("llm", params, spec)
        self._params_q8 = None
        if spec is not None and self._decoder_qbits:
            # the int8/int4 Pallas matmuls are single-device programs GSPMD
            # can't partition — under TP the decode loop runs the bf16
            # einsum path (per-chip weight reads are already split)
            log.info("llm TP: disabling decoder int%d (Pallas kernels are "
                     "single-device)", self._decoder_qbits)
        if spec is None and self._decoder_qbits:
            from audio_rag_tpu.models.llm import quantize_llm_weights

            # one-time int8/int4 of the decode-loop matmuls
            # (per-layer buffers; see quantize_llm_weights)
            bits = self._decoder_qbits
            lm_bits = self._lm_head_bits
            self._params_q8 = jax.jit(
                lambda p: quantize_llm_weights(p, self.dims, bits,
                                               lm_head_bits=lm_bits)
            )(self._params)
        self._tok = get_tokenizer(self.config.checkpoint_path,
                                  vocab_size=self.dims.vocab)
        if self.config.model == "eval-small":
            # the trained asset's emittable vocabulary: the hash
            # tokenizer decodes only ids this process has encoded, so a
            # fresh serving process would render trained emissions as
            # <unk> without the shipped reverse map
            try:
                import json
                from pathlib import Path

                vocab_path = (Path(__file__).resolve().parents[1]
                              / "assets" / "llm_small_vocab.json")
                if vocab_path.exists() and hasattr(self._tok, "_reverse"):
                    side = json.loads(vocab_path.read_text())
                    for k, v in side.items():
                        self._tok._reverse.setdefault(int(k), v)
            except Exception as exc:
                log.warning("llm vocab sidecar load failed: %s", exc)
        rm.register_model("generation", self.hbm_required_gb, self)

    def _unload(self) -> None:
        if self._engine is not None:
            self._engine.drop_params("llm")
        self._params = None
        self._params_q8 = None
        get_resource_manager().unregister("generation")

    def check_availability(self) -> bool:
        return self._params is not None

    @timed
    def generate(
        self,
        prompt: str,
        system: str | None = None,
        max_tokens: int | None = None,
        temperature: float | None = None,
    ) -> str:
        return self.generate_batch(
            [prompt], system=system, max_tokens=max_tokens,
            temperature=temperature,
        )[0]

    @timed
    def generate_batch(
        self,
        prompts: list[str],
        system: str | None = None,
        max_tokens: int | None = None,
        temperature: float | None = None,
    ) -> list[str]:
        """Decode many prompts as ONE batched device program.

        This is what makes contextual ingest viable: the reference's slowest
        stage is one serial Ollama HTTP call per chunk (~10 min/audio-hour,
        SURVEY.md hot loop #4); here all chunk headers decode together.
        Prompts left-pad to a shared bucket so positions align at the end.
        """
        self.require_loaded()
        get_resource_manager().touch("generation")
        if not prompts:
            return []
        texts = [f"{system}\n\n{p}" if system else p for p in prompts]
        cap = min(self.config.max_prompt_tokens, self.dims.max_len - 8)
        seqs = [self._tok.encode(t)[-cap:] for t in texts]
        max_p = max(len(s) for s in seqs)
        P = 1 << (max_p - 1).bit_length()  # pow-2 prompt bucket
        P = min(P, cap)
        # left-pad so every sequence ends at position P; pads are masked
        # out of attention via prompt_mask
        pad_id = self._tok.eos_id
        batch = np.full((len(seqs), P), pad_id, np.int32)
        mask = np.zeros((len(seqs), P), bool)
        for i, s in enumerate(seqs):
            s = s[-P:]
            batch[i, P - len(s):] = s
            mask[i, P - len(s):] = True

        max_new = min(
            max_tokens or self.config.max_tokens,
            self.dims.max_len - P - 1,
        )
        if max_new <= 0:
            raise GenerationError(
                "prompt exhausts the context window",
                context={"prompt_tokens": max_p,
                         "max_len": self.dims.max_len},
            )
        temp = self.config.temperature if temperature is None else temperature
        # pow-2 BATCH bucket: remainder batches (e.g. the tail of the
        # contextual header batches) would otherwise compile a fresh
        # program per distinct size — minutes each through the remote-
        # compile relay. Filler rows duplicate row 0 (an all-masked row
        # would softmax over -inf) and their outputs are dropped.
        B = len(seqs)
        B_pad = 1 << (B - 1).bit_length()
        if B_pad != B:
            batch = np.concatenate(
                [batch, np.tile(batch[:1], (B_pad - B, 1))])
            mask = np.concatenate([mask, np.tile(mask[:1], (B_pad - B, 1))])
        # ONE jitted program per static-scalar configuration — calling
        # llm_generate raw runs its lax.while_loop as a bare primitive:
        # the (L, B, HKV, C, hd) cache carries don't alias (measured
        # ~38 ms/token on llama-3.2-3b B=1 vs ~5.4 ms for the identical
        # jitted step) and every surrounding op pays its own relay
        # dispatch. Shape variations (P/B buckets, q8 on/off) are keyed
        # by jit's own trace cache; the instance dict keys the static
        # scalars. Programs survive drop_params (params are args).
        # speculation only pays when the weight read is unamortized:
        # measured B=1 llama-3.2-3b 5.22 -> 3.09 ms/token (1.69x) but
        # batch-8 wave 2790 -> 2312 tok/s (block verification's (k+1)x
        # compute + drafting glue outweigh the already-8-way-amortized
        # weight read) — so the flag applies to SINGLE-ROW waves only
        spec_iters = None
        if temp <= 0.0 and self.config.speculative_k > 0 and B_pad == 1:
            out, spec_iters = self._gen_program(
                "spec", max_new, pad_id, self.config.speculative_k)(
                self._params, prompt=batch, prompt_mask=mask,
                decoder_q8=self._params_q8,
            )
        else:
            out = self._gen_program("wave", max_new, pad_id, temp)(
                self._params, prompt=batch,
                rng=jax.random.PRNGKey(abs(hash(tuple(texts))) % (2 ** 31)),
                prompt_mask=mask, decoder_q8=self._params_q8,
            )
        out = np.asarray(out)
        results = []
        counts = []
        ids = []
        for i in range(len(seqs)):
            gen = out[i, P:]
            eos = np.nonzero(gen == pad_id)[0]
            if eos.size:
                gen = gen[: eos[0]]
            counts.append(int(gen.size))
            ids.append(gen.tolist())
            results.append(self._tok.decode(gen.tolist()).strip())
        #: actual generated ids per prompt (pre-EOS) — honest tokens/s
        #: numerator for benches (decode→re-encode is lossy under random
        #: init and undercounts), and the wave-vs-continuous parity
        #: test's ground truth
        self.last_token_counts = counts
        self.last_token_ids = ids
        #: drafter acceptance telemetry (single-row speculative path):
        #: tokens_per_verify ∈ [1, k]; accept_rate = fraction of the k-1
        #: drafted tokens the model's own argmax confirmed
        self.last_spec_stats = None
        if spec_iters is not None:
            n_iter = max(int(np.asarray(spec_iters)), 1)
            k = self.config.speculative_k
            tpv = max(counts[0] - 1, 0) / n_iter
            self.last_spec_stats = {
                "block_verifies": n_iter,
                "tokens_emitted": counts[0],
                "tokens_per_verify": round(tpv, 3),
                "accept_rate": round(max(tpv - 1.0, 0.0) / max(k - 1, 1), 4),
            }
        return results

    def generate_stream(
        self,
        prompt: str,
        system: str | None = None,
        max_tokens: int | None = None,
        temperature: float | None = None,
    ) -> Iterable[str]:
        """Chunked streaming: yields word groups of the finished completion.

        (True token-level streaming lands with the continuous-batching
        scheduler; the API contract — an iterator of text deltas — matches
        the reference's NDJSON streaming at ``generation/ollama.py:98-130``.)
        """
        text = self.generate(prompt, system, max_tokens, temperature)
        words = text.split()
        for i in range(0, len(words), 8):
            yield " ".join(words[i: i + 8]) + " "
