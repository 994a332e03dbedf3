"""Real-weight dress rehearsal: convert a directory of HF checkpoints,
load every engine through them, ingest, and run the evaluation sweep.

This is the ONE command a weight-available deployment runs to close the
fidelity gate this zero-egress environment cannot (reference CS229 run,
``evaluation/dataset.py:79-124``):

    python scripts/load_real.py /path/to/hf_models --out converted \
        [--audio lecture1.wav lecture2.wav] [--no-eval]

``/path/to/hf_models`` holds one subdirectory per checkpoint, e.g.::

    hf_models/whisper-large-v3/      (HF WhisperForConditionalGeneration)
    hf_models/bge-m3/                (XLM-RoBERTa + sparse_linear.pt)
    hf_models/bge-reranker-base/     (XLMRobertaForSequenceClassification)
    hf_models/llama-3.2-1b/          (LlamaForCausalLM)
    hf_models/spkrec-ecapa-voxceleb/ (speechbrain embedding_model.ckpt)

Each is classified by its ``config.json`` ``model_type`` (ECAPA by its
``.ckpt``), converted with the :mod:`audio_rag_tpu.convert` converters
(tokenizer files carried along), matched to a framework preset by the
converted tree's SHAPES, then the full stack loads through the engine:
ingest of the given audio (a synthetic conversation when none is given)
and the CS229-analog evaluation sweep. The path itself is CI-tested
end-to-end with tiny HF models (``tests/integration/test_load_real.py``)
so the rehearsal works the day real checkpoints arrive.
"""

from __future__ import annotations

import argparse
import json
import shutil
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def classify(src: Path) -> str | None:
    """HF-checkpoint kind from config.json / file layout."""
    cfgf = src / "config.json"
    if not cfgf.exists():
        if list(src.glob("*.ckpt")):
            return "speaker"
        return None
    try:
        cfg = json.loads(cfgf.read_text())
    except json.JSONDecodeError:
        return None
    mtype = cfg.get("model_type", "")
    archs = " ".join(cfg.get("architectures") or [])
    if mtype == "whisper":
        return "whisper"
    if mtype == "llama":
        return "llama"
    if mtype in ("xlm-roberta", "roberta", "bert"):
        return "reranker" if "SequenceClassification" in archs else "bgem3"
    return None


def _match_preset(presets: dict, probe) -> str | None:
    for name, dims in presets.items():
        if probe(dims):
            return name
    return None


def detect_model_names(converted: dict[str, dict]) -> dict[str, str]:
    """Framework preset/model names from converted tree shapes (the
    config must name dims the compiled programs are built for)."""
    names: dict[str, str] = {}
    if "whisper" in converted:
        from audio_rag_tpu.models.whisper import WHISPER_PRESETS

        p = converted["whisper"]
        vocab, d = p["decoder"]["tok_emb"]["table"].shape
        n_dec = p["decoder"]["blocks"]["ln1"]["g"].shape[0]
        n_mels = p["encoder"]["conv1"]["w"].shape[1]
        name = _match_preset(
            WHISPER_PRESETS,
            lambda dm: (dm.n_vocab, dm.n_text_state, dm.n_text_layer,
                        dm.n_mels) == (vocab, d, n_dec, n_mels))
        if name is None:
            raise SystemExit(
                f"whisper checkpoint dims (vocab={vocab}, d={d}, "
                f"layers={n_dec}, mels={n_mels}) match no preset")
        names["whisper"] = name
    if "llm" in converted:
        from audio_rag_tpu.models.llm import LLM_PRESETS

        p = converted["llm"]
        vocab, d = p["tok_emb"]["table"].shape
        n_layers = p["blocks"]["ln_attn"]["g"].shape[0]
        name = _match_preset(
            LLM_PRESETS,
            lambda dm: (dm.vocab, dm.d_model, dm.n_layers)
            == (vocab, d, n_layers))
        if name is None:
            raise SystemExit(
                f"llama checkpoint dims (vocab={vocab}, d={d}, "
                f"layers={n_layers}) match no preset")
        names["llm"] = name
    for kind, default in (("bgem3", "BAAI/bge-m3"),
                          ("reranker", "BAAI/bge-reranker-base")):
        if kind in converted:
            from audio_rag_tpu.models.bert import BERT_PRESETS

            p = converted[kind]["bert"]
            vocab, d = p["tok_emb"]["table"].shape
            n_layers = p["blocks"]["ln_attn"]["g"].shape[0]
            if (BERT_PRESETS["test"].vocab, BERT_PRESETS["test"].d_model,
                    BERT_PRESETS["test"].n_layers) == (vocab, d, n_layers):
                names[kind] = "test"
            else:
                names[kind] = default  # backends map non-test → xlmr dims
    return names


def convert_all(models_dir: Path, out: Path) -> dict[str, Path]:
    """Convert every recognized checkpoint under ``models_dir`` into its
    own ``out/<kind>_ck`` dir (orbax params + tokenizer files)."""
    from audio_rag_tpu.checkpoint import save_params
    from audio_rag_tpu.convert import CONVERTERS, convert_speaker

    converters = dict(CONVERTERS)
    converters["speaker"] = (convert_speaker, "speaker")
    paths: dict[str, Path] = {}
    trees: dict[str, dict] = {}
    for src in sorted(p for p in models_dir.iterdir() if p.is_dir()):
        kind = classify(src)
        if kind is None:
            print(f"skip {src.name}: unrecognized", file=sys.stderr)
            continue
        fn, name = converters[kind]
        params = fn(src)
        dst = out / f"{name}_ck"
        dst.mkdir(parents=True, exist_ok=True)
        save_params(dst, name, params)
        for pat in ("tokenizer*.json", "*.model", "vocab*", "merges.txt",
                    "special_tokens_map.json", "tokenizer_config.json"):
            for f in src.glob(pat):
                shutil.copy2(f, dst / f.name)
        paths[name] = dst
        trees[name] = params
        import jax

        n = sum(int(x.size) for x in jax.tree.leaves(params)
                if hasattr(x, "size"))
        print(json.dumps({"converted": src.name, "kind": kind,
                          "params": n, "out": str(dst)}))
    paths["_names"] = detect_model_names(trees)  # type: ignore[assignment]
    return paths


def build_config(paths: dict) -> "object":
    from audio_rag_tpu.config.schema import AudioRAGConfig

    names = paths["_names"]
    cfg: dict = {
        "retrieval": {"backend": "tpu"},
        "contextual": {"enabled": False},
        "tts": {"backend": "null"},
    }
    cfg["asr"] = (
        {"backend": "whisper-jax", "model_size": names["whisper"],
         "checkpoint_path": str(paths["whisper"]), "vad_filter": False,
         "compute_type": "float32" if names["whisper"].startswith("test")
         else "bfloat16"}
        if "whisper" in paths else {"backend": "fake"})
    cfg["diarization"] = (
        {"backend": "clustering",
         "checkpoint_path": str(paths["speaker"]),
         "vad_backend": "energy"}
        if "speaker" in paths else {"backend": "clustering",
                                    "vad_backend": "energy"})
    cfg["embedding"] = (
        {"backend": "bge-m3", "model": names["bgem3"],
         "checkpoint_path": str(paths["bgem3"])}
        if "bgem3" in paths else {"backend": "fake"})
    cfg["reranking"] = (
        {"backend": "bge-reranker", "model": names["reranker"],
         "checkpoint_path": str(paths["reranker"])}
        if "reranker" in paths else {"backend": "none"})
    cfg["generation"] = (
        {"backend": "llm-jax", "model": names["llm"],
         "checkpoint_path": str(paths["llm"]), "max_tokens": 64}
        if "llm" in paths else {"backend": "none"})
    return AudioRAGConfig(**cfg)


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("models_dir", help="directory of HF checkpoints")
    parser.add_argument("--out", default="converted")
    parser.add_argument("--audio", nargs="*", default=None,
                        help="audio files to ingest (default: synthetic)")
    parser.add_argument("--collection", default="real_weights")
    parser.add_argument("--no-eval", action="store_true")
    parser.add_argument("--cpu", action="store_true")
    args = parser.parse_args(argv)

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    out = Path(args.out)
    paths = convert_all(Path(args.models_dir), out)
    if not paths.get("_names") and len(paths) <= 1:
        raise SystemExit("no convertible checkpoints found")

    from audio_rag_tpu.pipeline.orchestrator import AudioRAG

    cfg = build_config(paths)
    rag = AudioRAG(cfg)

    audio_files = args.audio
    if not audio_files:
        import numpy as np

        from audio_rag_tpu.audio.io import write_wav
        from audio_rag_tpu.audio.synth import conversation, sample_voice

        rng = np.random.default_rng(7)
        voices = [sample_voice(rng) for _ in range(2)]
        wav, _ = conversation(rng, voices, duration_s=20.0)
        p = out / "rehearsal.wav"
        write_wav(str(p), wav, 16_000)
        audio_files = [str(p)]

    for f in audio_files:
        res = rag.ingest(f, collection=args.collection)
        print(json.dumps({"ingested": f, "chunks": res.num_chunks,
                          "speakers": res.num_speakers,
                          "duration_s": res.duration_s}))

    q = rag.query("What was discussed?", collection=args.collection,
                  top_k=3)
    print(json.dumps({"query_results": len(q.results),
                      "answer_len": len(q.answer or "")}))

    if not args.no_eval:
        from audio_rag_tpu.evaluation.dataset import CS229_EVAL_DATASET
        from audio_rag_tpu.evaluation.metrics import RAGEvaluator

        class _Pipe:  # evaluator drives pipeline.query(collection=...)
            def query(self, *a, **kw):
                kw.setdefault("collection", args.collection)
                return rag.query(*a, **kw)

        ev = RAGEvaluator()
        results = ev.evaluate_dataset(
            _Pipe(), CS229_EVAL_DATASET, search_types=["dense", "hybrid"],
            generate_answers=cfg.generation.backend != "none")
        summary = ev.summarize_results(results)
        print(json.dumps({"evaluation": summary}, default=float))
    rag.unload_all()
    return 0


if __name__ == "__main__":
    sys.exit(main())
