"""Offline converters: HuggingFace torch checkpoints → framework param trees.

The reference downloads weights at runtime (``asr/whisper.py:55``,
``embeddings/bge.py:48``); this build is zero-egress, so deployment converts
checkpoints offline once:

    python -m audio_rag_tpu.convert whisper  /path/to/hf-whisper-large-v3 out/
    python -m audio_rag_tpu.convert bgem3    /path/to/bge-m3             out/
    python -m audio_rag_tpu.convert reranker /path/to/bge-reranker-base  out/
    python -m audio_rag_tpu.convert llama    /path/to/llama-3.2-3b       out/

then point ``*.checkpoint_path`` at ``out/`` (the HF tokenizer files in the
source dir are reused by copying them next to the converted params).

Weight-name maps follow the public HF implementations; all linears
transpose to the framework's (d_in, d_out) layout and per-layer tensors
stack along a leading layer axis for the scan-over-layers apply functions.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Callable

import numpy as np

from audio_rag_tpu.utils.logging import get_logger

log = get_logger(__name__)

__all__ = ["load_state_dict", "convert_whisper", "convert_xlmr_encoder",
           "convert_bgem3", "convert_reranker", "convert_llama",
           "convert_vad_torch", "convert_speaker"]


def load_state_dict(model_dir: str | Path) -> dict[str, np.ndarray]:
    """Read all tensors from safetensors or torch .bin shards."""
    d = Path(model_dir)
    tensors: dict[str, np.ndarray] = {}
    st_files = sorted(d.glob("*.safetensors"))
    if st_files:
        from safetensors.numpy import load_file

        for f in st_files:
            tensors.update(load_file(str(f)))
        return tensors
    bin_files = (sorted(d.glob("pytorch_model*.bin"))
                 or sorted(d.glob("*.pt")) or sorted(d.glob("*.ckpt")))
    if not bin_files:
        raise FileNotFoundError(f"no checkpoint tensors found in {d}")
    import torch

    for f in bin_files:
        sd = torch.load(f, map_location="cpu", weights_only=True)
        for k, v in sd.items():
            tensors[k] = v.float().numpy()
    return tensors


def _lin(sd: dict, prefix: str, bias: bool = True) -> dict[str, np.ndarray]:
    out = {"w": np.ascontiguousarray(sd[f"{prefix}.weight"].T)}
    if bias and f"{prefix}.bias" in sd:
        out["b"] = sd[f"{prefix}.bias"]
    return out


def _ln(sd: dict, prefix: str) -> dict[str, np.ndarray]:
    return {"g": sd[f"{prefix}.weight"], "b": sd[f"{prefix}.bias"]}


def _stack(layers: list[dict]) -> dict:
    import jax

    return jax.tree.map(lambda *xs: np.stack(xs), *layers)


# -- Whisper ---------------------------------------------------------------

def convert_whisper(model_dir: str | Path) -> dict[str, Any]:
    """HF WhisperForConditionalGeneration → init_whisper tree."""
    sd = load_state_dict(model_dir)
    pre = "model." if "model.encoder.conv1.weight" in sd else ""

    def base_block(p: str) -> dict:
        return {
            "ln1": _ln(sd, f"{p}.self_attn_layer_norm"),
            "attn": {
                "q": _lin(sd, f"{p}.self_attn.q_proj"),
                "k": _lin(sd, f"{p}.self_attn.k_proj", bias=False),
                "v": _lin(sd, f"{p}.self_attn.v_proj"),
                "o": _lin(sd, f"{p}.self_attn.out_proj"),
            },
            "mlp": {
                "up": _lin(sd, f"{p}.fc1"),
                "down": _lin(sd, f"{p}.fc2"),
            },
            "ln_mlp": _ln(sd, f"{p}.final_layer_norm"),
        }

    def enc_block(i: int) -> dict:
        return base_block(f"{pre}encoder.layers.{i}")

    def dec_block(i: int) -> dict:
        p = f"{pre}decoder.layers.{i}"
        return {
            **base_block(p),
            "cross": {
                "q": _lin(sd, f"{p}.encoder_attn.q_proj"),
                "k": _lin(sd, f"{p}.encoder_attn.k_proj", bias=False),
                "v": _lin(sd, f"{p}.encoder_attn.v_proj"),
                "o": _lin(sd, f"{p}.encoder_attn.out_proj"),
            },
            "ln_cross": _ln(sd, f"{p}.encoder_attn_layer_norm"),
        }

    n_enc = 1 + max(
        int(k.split(".")[2 if not pre else 3])
        for k in sd if k.startswith(f"{pre}encoder.layers.")
    )
    n_dec = 1 + max(
        int(k.split(".")[2 if not pre else 3])
        for k in sd if k.startswith(f"{pre}decoder.layers.")
    )
    return {
        "encoder": {
            # HF conv1d weight (out, in, k) → (k, in, out)
            "conv1": {
                "w": np.ascontiguousarray(
                    sd[f"{pre}encoder.conv1.weight"].transpose(2, 1, 0)
                ),
                "b": sd[f"{pre}encoder.conv1.bias"],
            },
            "conv2": {
                "w": np.ascontiguousarray(
                    sd[f"{pre}encoder.conv2.weight"].transpose(2, 1, 0)
                ),
                "b": sd[f"{pre}encoder.conv2.bias"],
            },
            "pos": sd[f"{pre}encoder.embed_positions.weight"],
            "blocks": _stack([enc_block(i) for i in range(n_enc)]),
            "ln_post": _ln(sd, f"{pre}encoder.layer_norm"),
        },
        "decoder": {
            "tok_emb": {"table": sd[f"{pre}decoder.embed_tokens.weight"]},
            "pos_emb": sd[f"{pre}decoder.embed_positions.weight"],
            "blocks": _stack([dec_block(i) for i in range(n_dec)]),
            "ln": _ln(sd, f"{pre}decoder.layer_norm"),
        },
    }


# -- XLM-R encoders --------------------------------------------------------

def convert_xlmr_encoder(sd: dict, pre: str = "") -> dict[str, Any]:
    def block(i: int) -> dict:
        p = f"{pre}encoder.layer.{i}"
        return {
            "attn": {
                "q": _lin(sd, f"{p}.attention.self.query"),
                "k": _lin(sd, f"{p}.attention.self.key"),
                "v": _lin(sd, f"{p}.attention.self.value"),
                "o": _lin(sd, f"{p}.attention.output.dense"),
            },
            "ln_attn": _ln(sd, f"{p}.attention.output.LayerNorm"),
            "mlp": {
                "up": _lin(sd, f"{p}.intermediate.dense"),
                "down": _lin(sd, f"{p}.output.dense"),
            },
            "ln_mlp": _ln(sd, f"{p}.output.LayerNorm"),
        }

    n = 1 + max(
        int(k[len(pre) + 14:].split(".")[0])
        for k in sd if k.startswith(f"{pre}encoder.layer.")
    )
    pos = sd[f"{pre}embeddings.position_embeddings.weight"]
    # fold the constant token-type-0 embedding into the position table
    # (every token receives exactly one of each)
    tt_key = f"{pre}embeddings.token_type_embeddings.weight"
    if tt_key in sd:
        pos = pos + sd[tt_key][0][None, :]
    return {
        "tok_emb": {"table": sd[f"{pre}embeddings.word_embeddings.weight"]},
        "pos_emb": {"table": pos},
        "ln_emb": _ln(sd, f"{pre}embeddings.LayerNorm"),
        "blocks": _stack([block(i) for i in range(n)]),
    }


def _detect_prefix(sd: dict, *candidates: str) -> str:
    for c in candidates:
        if any(k.startswith(f"{c}embeddings.") for k in sd):
            return c
    raise KeyError(f"no XLM-R prefix found among {candidates}")


def convert_bgem3(model_dir: str | Path) -> dict[str, Any]:
    """BAAI/bge-m3 → init_bgem3 tree (backbone + sparse_linear head)."""
    d = Path(model_dir)
    sd = load_state_dict(d)
    pre = _detect_prefix(sd, "", "roberta.", "model.")
    params = {"bert": convert_xlmr_encoder(sd, pre)}
    sparse_file = d / "sparse_linear.pt"
    if sparse_file.exists():
        import torch

        sl = torch.load(sparse_file, map_location="cpu", weights_only=True)
        params["sparse"] = {
            "w": np.ascontiguousarray(sl["weight"].float().numpy().T),
            "b": sl["bias"].float().numpy(),
        }
    else:
        log.warning("sparse_linear.pt missing; sparse head stays random")
        params["sparse"] = {
            "w": np.zeros((params["bert"]["tok_emb"]["table"].shape[1], 1),
                          np.float32),
            "b": np.zeros((1,), np.float32),
        }
    return params


def convert_reranker(model_dir: str | Path) -> dict[str, Any]:
    """BAAI/bge-reranker-base (XLMRobertaForSequenceClassification)."""
    sd = load_state_dict(model_dir)
    pre = _detect_prefix(sd, "roberta.", "", "model.")
    return {
        "bert": convert_xlmr_encoder(sd, pre),
        "dense": _lin(sd, "classifier.dense"),
        "out": _lin(sd, "classifier.out_proj"),
    }


# -- LLaMA -----------------------------------------------------------------

def convert_llama(model_dir: str | Path) -> dict[str, Any]:
    """HF LlamaForCausalLM → init_llm tree (half-split RoPE matches)."""
    sd = load_state_dict(model_dir)
    pre = "model." if "model.embed_tokens.weight" in sd else ""

    def block(i: int) -> dict:
        p = f"{pre}layers.{i}"
        return {
            "ln_attn": {"g": sd[f"{p}.input_layernorm.weight"]},
            "attn": {
                "q": _lin(sd, f"{p}.self_attn.q_proj", bias=False),
                "k": _lin(sd, f"{p}.self_attn.k_proj", bias=False),
                "v": _lin(sd, f"{p}.self_attn.v_proj", bias=False),
                "o": _lin(sd, f"{p}.self_attn.o_proj", bias=False),
            },
            "ln_mlp": {"g": sd[f"{p}.post_attention_layernorm.weight"]},
            "mlp": {
                "gate": _lin(sd, f"{p}.mlp.gate_proj", bias=False),
                "up": _lin(sd, f"{p}.mlp.up_proj", bias=False),
                "down": _lin(sd, f"{p}.mlp.down_proj", bias=False),
            },
        }

    n = 1 + max(
        int(k[len(pre) + 7:].split(".")[0])
        for k in sd if k.startswith(f"{pre}layers.")
    )
    emb = sd[f"{pre}embed_tokens.weight"]
    head = sd.get("lm_head.weight", emb)  # tied when absent
    return {
        "tok_emb": {"table": emb},
        "blocks": _stack([block(i) for i in range(n)]),
        "ln_f": {"g": sd[f"{pre}norm.weight"]},
        "lm_head": {"w": np.ascontiguousarray(head.T)},
    }


# -- ECAPA speaker encoder -------------------------------------------------

def convert_speaker(model_dir: str | Path) -> dict[str, Any]:
    """speechbrain ``spkrec-ecapa-voxceleb``-format ECAPA-TDNN checkpoint
    → :func:`audio_rag_tpu.models.ecapa.ecapa_embed` tree.

    Replaces the titanet_large download the reference's diarizer does at
    runtime (``diarization/nemo.py:45-100``). Layout expectations (the
    names the speechbrain release ships in ``embedding_model.ckpt``; an
    optional ``embedding_model.`` prefix is stripped):

    * ``blocks.0`` frontend TDNN; ``blocks.1..3`` SE-Res2Net blocks with
      ``tdnn1`` / ``res2net_block.blocks.{j}`` / ``tdnn2`` /
      ``se_block.conv1|conv2`` (+ optional ``shortcut``);
    * ``mfa`` aggregation TDNN, ``asp`` attentive pooling
      (``asp.tdnn``, ``asp.conv``), ``asp_bn``, ``fc``.

    Eval-mode BatchNorm folds to a per-channel affine here
    (``s = γ/√(var+ε)``, ``o = β − mean·s``, ε=1e-5 — it sits after the
    ReLU so it cannot fold into the conv); torch Conv1d weights
    (C_out, C_in, K) transpose to (K, C_in, C_out), and 1×1 convs used
    as channel mixes (SE gates, ASP projection, fc) squeeze to the
    framework's (d_in, d_out) linear layout. Parity with the published
    equations is pinned by ``tests/unit/models/test_ecapa_parity.py``.
    """
    sd = load_state_dict(model_dir)
    pre = "embedding_model." \
        if any(k.startswith("embedding_model.") for k in sd) else ""

    def conv(p: str) -> dict[str, np.ndarray]:
        w = np.asarray(sd[f"{p}.conv.weight"])  # (C_out, C_in, K)
        out = {"w": np.ascontiguousarray(w.transpose(2, 1, 0))}
        out["b"] = (np.asarray(sd[f"{p}.conv.bias"])
                    if f"{p}.conv.bias" in sd
                    else np.zeros(w.shape[0], np.float32))
        return out

    def bn(p: str) -> dict[str, np.ndarray]:
        g = np.asarray(sd[f"{p}.norm.weight"])
        b = np.asarray(sd[f"{p}.norm.bias"])
        mean = np.asarray(sd[f"{p}.norm.running_mean"])
        var = np.asarray(sd[f"{p}.norm.running_var"])
        s = g / np.sqrt(var + 1e-5)
        return {"s": s.astype(np.float32),
                "o": (b - mean * s).astype(np.float32)}

    def tdnn(p: str) -> dict:
        return {"conv": conv(f"{p}.conv"), "bn": bn(f"{p}.norm")}

    def lin1x1(p: str) -> dict[str, np.ndarray]:
        c = conv(p)
        return {"w": np.ascontiguousarray(c["w"][0]), "b": c["b"]}

    def layer(i: int) -> dict:
        p = f"{pre}blocks.{i}"
        n_res = 1 + max(
            int(k[len(f"{p}.res2net_block.blocks."):].split(".")[0])
            for k in sd if k.startswith(f"{p}.res2net_block.blocks.")
        )
        out = {
            "tdnn1": tdnn(f"{p}.tdnn1"),
            "res2net": [tdnn(f"{p}.res2net_block.blocks.{j}")
                        for j in range(n_res)],
            "tdnn2": tdnn(f"{p}.tdnn2"),
            "se": {"c1": lin1x1(f"{p}.se_block.conv1"),
                   "c2": lin1x1(f"{p}.se_block.conv2")},
        }
        if f"{p}.shortcut.conv.weight" in sd:
            out["shortcut"] = conv(f"{p}.shortcut")
        return out

    n_layers = 1 + max(
        int(k[len(pre) + 7:].split(".")[0])
        for k in sd if k.startswith(f"{pre}blocks.")
    )
    return {
        "frontend": tdnn(f"{pre}blocks.0"),
        "layers": [layer(i) for i in range(1, n_layers)],
        "mfa": tdnn(f"{pre}mfa"),
        "asp": {"tdnn": tdnn(f"{pre}asp.tdnn"),
                "conv": lin1x1(f"{pre}asp.conv")},
        "asp_bn": bn(f"{pre}asp_bn"),
        "fc": lin1x1(f"{pre}fc"),
    }


def convert_vad_torch(sd: dict) -> dict[str, Any]:
    """Torch conv-VAD state dict → :func:`models.speaker.vad_scores` params.

    Expected module layout (the Silero/marblenet-class shape
    ``scripts/train_vad.py`` trains): ``c1``/``c2`` = ``nn.Conv1d`` (SAME
    padding, dilation 1 then 2), ``ln1``/``ln2`` = channel LayerNorm,
    ``out`` = ``nn.Linear(channels, 1)``. Torch Conv1d weights are
    (C_out, C_in, K); ours are (K, C_in, C_out).
    """
    def conv(prefix: str) -> dict[str, np.ndarray]:
        w = np.asarray(sd[f"{prefix}.weight"])  # (C_out, C_in, K)
        return {
            "w": np.transpose(w, (2, 1, 0)).copy(),
            "b": np.asarray(sd[f"{prefix}.bias"]),
        }

    return {
        "c1": conv("c1"),
        "ln1": _ln(sd, "ln1"),
        "c2": conv("c2"),
        "ln2": _ln(sd, "ln2"),
        "out": _lin(sd, "out"),
    }


CONVERTERS: dict[str, tuple[Callable, str]] = {
    "whisper": (convert_whisper, "whisper"),
    "bgem3": (convert_bgem3, "bgem3"),
    "reranker": (convert_reranker, "reranker"),
    "llama": (convert_llama, "llm"),
    "speaker": (convert_speaker, "speaker"),
}


def main() -> None:  # pragma: no cover - CLI
    import argparse
    import shutil

    from audio_rag_tpu.checkpoint import save_params

    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("kind", choices=sorted(CONVERTERS))
    parser.add_argument("src", help="HF model directory")
    parser.add_argument("dst", help="output checkpoint directory")
    args = parser.parse_args()

    fn, name = CONVERTERS[args.kind]
    params = fn(args.src)
    save_params(args.dst, name, params)
    # carry tokenizer files along so get_tokenizer finds them
    for pat in ("tokenizer*.json", "*.model", "vocab*", "merges.txt",
                "special_tokens_map.json", "tokenizer_config.json"):
        for f in Path(args.src).glob(pat):
            shutil.copy2(f, Path(args.dst) / f.name)
    sizes = sum(
        x.size * x.itemsize for x in
        __import__("jax").tree.leaves(params) if hasattr(x, "size")
    )
    print(json.dumps({"kind": args.kind, "out": args.dst,
                      "params_gb": round(sizes / 1e9, 3)}))


if __name__ == "__main__":  # pragma: no cover
    main()
