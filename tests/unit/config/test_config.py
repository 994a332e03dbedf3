import pytest

from audio_rag_tpu.config.loader import (
    _convert_value,
    apply_env_overrides,
    deep_merge,
    load_config,
)
from audio_rag_tpu.config.schema import AudioRAGConfig
from audio_rag_tpu.core.exceptions import ConfigError


class TestDefaults:
    def test_schema_defaults(self):
        cfg = AudioRAGConfig()
        assert cfg.asr.model_size == "large-v3"
        assert cfg.chunking.max_tokens == 256
        assert cfg.retrieval.search_type == "hybrid"
        assert cfg.reranking.initial_k == 20
        assert cfg.embedding.batch_size == 32
        assert cfg.mesh.model_axis == 1

    def test_validation_bounds(self):
        with pytest.raises(Exception):
            AudioRAGConfig(chunking={"max_tokens": 10})  # ge=50

    def test_streaming_section(self):
        cfg = AudioRAGConfig(streaming={"chunk_duration": 3.0,
                                        "overlap_duration": 0.6,
                                        "max_decode_tokens": 40})
        rt = cfg.streaming.to_runtime()
        assert rt.chunk_duration == 3.0
        assert rt.overlap_duration == 0.6
        assert rt.max_decode_tokens == 40
        # defaults mirror the runtime dataclass (reference 5 s / 1 s)
        d = AudioRAGConfig().streaming.to_runtime()
        assert (d.chunk_duration, d.overlap_duration) == (5.0, 1.0)

    def test_low_latency_profile_loads(self):
        cfg = load_config(env="low_latency")
        assert cfg.streaming.chunk_duration == 3.0
        assert cfg.asr.cross_kv_int8 is True


class TestDeepMerge:
    def test_nested(self):
        a = {"x": {"y": 1, "z": 2}, "k": 1}
        b = {"x": {"y": 9}}
        merged = deep_merge(a, b)
        assert merged == {"x": {"y": 9, "z": 2}, "k": 1}
        assert a["x"]["y"] == 1  # no mutation

    def test_override_replaces_scalar_with_dict(self):
        assert deep_merge({"x": 1}, {"x": {"y": 2}}) == {"x": {"y": 2}}


class TestEnvOverrides:
    def test_convert(self):
        assert _convert_value("true") is True
        assert _convert_value("OFF") is False
        assert _convert_value("null") is None
        assert _convert_value("42") == 42
        assert _convert_value("2.5") == 2.5
        assert _convert_value("hello") == "hello"

    def test_nested_override(self):
        data = {"asr": {"model_size": "large-v3"}}
        out = apply_env_overrides(
            data,
            {"AUDIO_RAG__ASR__MODEL_SIZE": "base",
             "AUDIO_RAG__RETRIEVAL__TOP_K": "7",
             "UNRELATED": "x"},
        )
        assert out["asr"]["model_size"] == "base"
        assert out["retrieval"]["top_k"] == 7


class TestLoadConfig:
    def test_layering(self, tmp_path, monkeypatch):
        (tmp_path / "base.yaml").write_text(
            "asr:\n  model_size: base\nchunking:\n  max_tokens: 500\n"
        )
        (tmp_path / "dev.yaml").write_text("chunking:\n  max_tokens: 128\n")
        monkeypatch.delenv("AUDIO_RAG_ENV", raising=False)
        cfg = load_config(env="dev", configs_dir=tmp_path)
        assert cfg.asr.model_size == "base"
        assert cfg.chunking.max_tokens == 128

    def test_explicit_file_wins(self, tmp_path):
        (tmp_path / "base.yaml").write_text("retrieval:\n  top_k: 3\n")
        extra = tmp_path / "extra.yaml"
        extra.write_text("retrieval:\n  top_k: 9\n")
        cfg = load_config(config_path=extra, configs_dir=tmp_path)
        assert cfg.retrieval.top_k == 9

    def test_env_var_overrides_yaml(self, tmp_path, monkeypatch):
        (tmp_path / "base.yaml").write_text("retrieval:\n  top_k: 3\n")
        monkeypatch.setenv("AUDIO_RAG__RETRIEVAL__TOP_K", "8")
        cfg = load_config(configs_dir=tmp_path)
        assert cfg.retrieval.top_k == 8

    def test_missing_explicit_file_raises(self, tmp_path):
        with pytest.raises(ConfigError):
            load_config(config_path=tmp_path / "nope.yaml", configs_dir=tmp_path)

    def test_invalid_values_raise(self, tmp_path):
        (tmp_path / "base.yaml").write_text("chunking:\n  max_tokens: 5\n")
        with pytest.raises(ConfigError):
            load_config(configs_dir=tmp_path)


class TestReferenceConfigAliases:
    """A reference (CUDA-stack) deployment's YAML loads UNCHANGED: the
    loader maps reference backend names / dtypes to their TPU-native
    equivalents (docs/MIGRATION.md key table, performed automatically)."""

    REFERENCE_YAML = """
asr:
  backend: faster-whisper
  model_size: large-v3
  device: auto
  compute_type: float16
  vad_filter: true
  vad_threshold: 0.5
diarization:
  backend: nemo
  min_speech_duration_ms: 250
chunking:
  strategy: speaker_turn
  max_tokens: 256
contextual:
  enabled: false
  window_size: 1
embedding:
  backend: bge-m3
  batch_size: 32
retrieval:
  backend: qdrant
  collection_name: audio_rag
  search_type: hybrid
  qdrant_host: localhost
  qdrant_port: 6333
reranking:
  backend: bge-reranker
  initial_k: 20
expansion:
  backend: hyde
generation:
  backend: ollama
  model: llama3.2:3b
  temperature: 0.7
tts:
  backend: piper
  fallback_backend: edge-tts
resources:
  max_vram_gb: 12.0
  unload_after_idle_seconds: 300
"""

    def test_reference_yaml_loads(self, tmp_path):
        (tmp_path / "base.yaml").write_text(self.REFERENCE_YAML)
        cfg = load_config(configs_dir=tmp_path)
        assert cfg.asr.backend == "whisper-jax"
        assert cfg.asr.compute_type == "bfloat16"
        assert cfg.diarization.backend == "clustering"
        assert cfg.retrieval.backend == "tpu"
        assert cfg.generation.backend == "llm-jax"
        assert cfg.generation.model == "llama-3.2-3b"
        assert cfg.tts.fallback_backend == "null"
        assert cfg.expansion.backend == "hyde"

    def test_reference_int8_maps_to_int8_decode_kernels(self, tmp_path):
        (tmp_path / "base.yaml").write_text(
            "asr:\n  backend: faster-whisper\n  compute_type: int8\n")
        cfg = load_config(configs_dir=tmp_path)
        assert cfg.asr.compute_type == "bfloat16"
        assert cfg.asr.cross_kv_int8 is True
        assert cfg.asr.decoder_int8 is True

    def test_pyannote_maps_to_second_diarizer(self, tmp_path):
        (tmp_path / "base.yaml").write_text(
            "diarization:\n  backend: pyannote\n")
        cfg = load_config(configs_dir=tmp_path)
        assert cfg.diarization.backend == "ahc"

    def test_native_names_untouched(self, tmp_path):
        (tmp_path / "base.yaml").write_text(
            "asr:\n  backend: whisper-jax\n  compute_type: float32\n")
        cfg = load_config(configs_dir=tmp_path)
        assert cfg.asr.backend == "whisper-jax"
        assert cfg.asr.compute_type == "float32"
