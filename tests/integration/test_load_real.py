"""Real-weight path dress rehearsal (``scripts/load_real.py``) driven
end-to-end with tiny HF checkpoints.

The actual released weights are unreachable in this zero-egress
environment; this test guarantees the ONE command a weight-available
deployment runs — classify → convert → preset-detect → load every
engine → ingest → query → evaluation sweep — works, using tiny HF
models whose dims match the framework "test" presets exactly (the
same way the converter-parity suites pin the per-model math).
"""

import json
import sys
from pathlib import Path

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

sys.path.insert(0, str(Path(__file__).resolve().parents[2] / "scripts"))

import load_real  # noqa: E402


def _tiny_whisper(d: Path) -> None:
    from transformers import WhisperConfig, WhisperForConditionalGeneration

    cfg = WhisperConfig(
        vocab_size=1024, num_mel_bins=80,
        encoder_layers=2, encoder_attention_heads=2,
        decoder_layers=2, decoder_attention_heads=2,
        d_model=64, encoder_ffn_dim=256, decoder_ffn_dim=256,
        max_source_positions=60, max_target_positions=32,
        pad_token_id=0, bos_token_id=1, eos_token_id=2,
        decoder_start_token_id=1, suppress_tokens=None,
        begin_suppress_tokens=None,
    )
    torch.manual_seed(0)
    WhisperForConditionalGeneration(cfg).eval().save_pretrained(
        d, safe_serialization=True)


def _tiny_llama(d: Path) -> None:
    from transformers import LlamaConfig, LlamaForCausalLM

    cfg = LlamaConfig(
        vocab_size=512, hidden_size=64, num_attention_heads=4,
        num_key_value_heads=2, num_hidden_layers=2,
        intermediate_size=128, max_position_embeddings=128,
        rope_theta=10000.0,
    )
    torch.manual_seed(1)
    LlamaForCausalLM(cfg).eval().save_pretrained(
        d, safe_serialization=True)


def _tiny_xlmr(d: Path, classification: bool) -> None:
    from transformers import (
        XLMRobertaConfig,
        XLMRobertaForSequenceClassification,
        XLMRobertaModel,
    )

    cfg = XLMRobertaConfig(
        vocab_size=1024, hidden_size=64, num_attention_heads=2,
        num_hidden_layers=2, intermediate_size=128,
        max_position_embeddings=130, pad_token_id=1, num_labels=1,
    )
    torch.manual_seed(2)
    model = (XLMRobertaForSequenceClassification(cfg) if classification
             else XLMRobertaModel(cfg)).eval()
    model.save_pretrained(d, safe_serialization=True)
    if not classification:
        # bge-m3's sparse head ships beside the backbone
        sl = torch.nn.Linear(64, 1)
        torch.save(sl.state_dict(), d / "sparse_linear.pt")


def _tiny_ecapa(d: Path) -> None:
    # reuse the parity test's torch ECAPA (the speechbrain layout)
    sys.path.insert(0, str(Path(__file__).resolve().parents[1]
                           / "unit" / "models"))
    from test_ecapa_parity import ECAPA

    torch.manual_seed(3)
    model = ECAPA().eval()
    torch.save(model.state_dict(), d / "embedding_model.ckpt")


@pytest.fixture(scope="module")
def models_dir(tmp_path_factory) -> Path:
    root = tmp_path_factory.mktemp("hf_models")
    for name, make in (
        ("whisper-test", _tiny_whisper),
        ("llama-test", _tiny_llama),
        ("bge-m3-test", lambda d: _tiny_xlmr(d, classification=False)),
        ("bge-reranker-test", lambda d: _tiny_xlmr(d, classification=True)),
        ("spkrec-ecapa-test", _tiny_ecapa),
    ):
        d = root / name
        d.mkdir()
        make(d)
    (root / "not-a-model").mkdir()  # classifier must skip it
    return root


class TestLoadReal:
    def test_classify(self, models_dir):
        kinds = {p.name: load_real.classify(p)
                 for p in sorted(models_dir.iterdir())}
        assert kinds == {
            "bge-m3-test": "bgem3",
            "bge-reranker-test": "reranker",
            "llama-test": "llama",
            "not-a-model": None,
            "spkrec-ecapa-test": "speaker",
            "whisper-test": "whisper",
        }

    def test_full_rehearsal(self, models_dir, tmp_path, capsys):
        """The one command, end-to-end: every engine loads its converted
        checkpoint, ingest + query + eval sweep all run."""
        rc = load_real.main([
            str(models_dir), "--out", str(tmp_path / "conv"),
            "--collection", "rehearsal",
        ])
        assert rc == 0
        lines = [json.loads(ln) for ln in
                 capsys.readouterr().out.strip().splitlines()
                 if ln.startswith("{")]
        converted = {e["kind"] for e in lines if "converted" in e}
        assert converted == {"whisper", "llama", "bgem3", "reranker",
                             "speaker"}
        ingested = [e for e in lines if "ingested" in e]
        assert ingested and ingested[0]["chunks"] > 0
        assert any("query_results" in e for e in lines)
        ev = [e for e in lines if "evaluation" in e]
        assert ev and "dense" in ev[0]["evaluation"]

    def test_preset_detection_rejects_unknown_dims(self, tmp_path):
        from transformers import WhisperConfig, WhisperForConditionalGeneration

        cfg = WhisperConfig(
            vocab_size=333, num_mel_bins=80, encoder_layers=2,
            decoder_layers=2, encoder_attention_heads=2,
            decoder_attention_heads=2, d_model=64,
            encoder_ffn_dim=256, decoder_ffn_dim=256,
            max_source_positions=60, max_target_positions=32,
            pad_token_id=0, bos_token_id=1, eos_token_id=2,
            decoder_start_token_id=1,
            suppress_tokens=None, begin_suppress_tokens=None,
        )
        d = tmp_path / "weird-whisper"
        d.mkdir()
        WhisperForConditionalGeneration(cfg).eval().save_pretrained(
            d, safe_serialization=True)
        with pytest.raises(SystemExit, match="match no preset"):
            load_real.convert_all(tmp_path, tmp_path / "out")
