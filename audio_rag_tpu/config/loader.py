"""Layered YAML config loading with environment overrides.

Parity: reference ``config/loader.py:16-173``:
defaults → ``configs/base.yaml`` → ``configs/{env}.yaml`` → explicit file,
deep-merged, then ``AUDIO_RAG__SECTION__KEY`` env overrides with bool/num/null
coercion. Same env-var grammar so reference deployments carry over.
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Any, Mapping

import yaml

from audio_rag_tpu.config.schema import AudioRAGConfig
from audio_rag_tpu.core.exceptions import ConfigError
from audio_rag_tpu.utils.logging import get_logger

log = get_logger(__name__)

__all__ = ["load_config", "deep_merge", "apply_env_overrides"]

ENV_PREFIX = "AUDIO_RAG__"


def deep_merge(base: dict[str, Any], override: Mapping[str, Any]) -> dict[str, Any]:
    """Recursively merge ``override`` into a copy of ``base``."""
    out = dict(base)
    for key, val in override.items():
        if key in out and isinstance(out[key], dict) and isinstance(val, Mapping):
            out[key] = deep_merge(out[key], val)
        else:
            out[key] = val
    return out


def _convert_value(raw: str) -> Any:
    """Coerce env-var strings: bool/null/int/float, else string.

    Same coercion table as reference ``config/loader.py:59-87``.
    """
    low = raw.strip().lower()
    if low in ("true", "yes", "on"):
        return True
    if low in ("false", "no", "off"):
        return False
    if low in ("null", "none", ""):
        return None
    try:
        return int(raw)
    except ValueError:
        pass
    try:
        return float(raw)
    except ValueError:
        pass
    return raw


def apply_env_overrides(
    data: dict[str, Any], environ: Mapping[str, str] | None = None
) -> dict[str, Any]:
    """Apply ``AUDIO_RAG__SECTION__KEY=value`` overrides (nested via ``__``)."""
    env = environ if environ is not None else os.environ
    out = dict(data)
    for name, raw in env.items():
        if not name.startswith(ENV_PREFIX):
            continue
        path = [p.lower() for p in name[len(ENV_PREFIX):].split("__") if p]
        if not path:
            continue
        node = out
        for part in path[:-1]:
            nxt = node.get(part)
            if not isinstance(nxt, dict):
                nxt = {}
            node[part] = dict(nxt)
            node = node[part]
        node[path[-1]] = _convert_value(raw)
    return out


def _read_yaml(path: Path) -> dict[str, Any]:
    try:
        with open(path) as f:
            data = yaml.safe_load(f)
    except yaml.YAMLError as exc:
        raise ConfigError(f"invalid YAML in {path}: {exc}",
                          context={"path": str(path)}) from exc
    if data is None:
        return {}
    if not isinstance(data, dict):
        raise ConfigError(f"config root must be a mapping: {path}",
                          context={"path": str(path)})
    return data


def load_config(
    config_path: str | Path | None = None,
    env: str | None = None,
    configs_dir: str | Path = "configs",
    overrides: Mapping[str, Any] | None = None,
) -> AudioRAGConfig:
    """Load the layered config.

    Order (later wins): schema defaults → ``configs/base.yaml`` →
    ``configs/{env}.yaml`` → ``config_path`` → env vars → ``overrides``.
    """
    data: dict[str, Any] = {}
    cdir = Path(configs_dir)

    base = cdir / "base.yaml"
    if base.is_file():
        data = deep_merge(data, _read_yaml(base))

    env = env or os.environ.get("AUDIO_RAG_ENV")
    if env:
        env_file = cdir / f"{env}.yaml"
        if env_file.is_file():
            data = deep_merge(data, _read_yaml(env_file))

    if config_path is not None:
        p = Path(config_path)
        if not p.is_file():
            raise ConfigError(f"config file not found: {p}",
                              context={"path": str(p)})
        data = deep_merge(data, _read_yaml(p))

    data = apply_env_overrides(data)
    if overrides:
        data = deep_merge(data, overrides)
    data = normalize_reference_config(data)

    try:
        return AudioRAGConfig(**data)
    except Exception as exc:
        raise ConfigError(f"config validation failed: {exc}") from exc


#: reference backend names → TPU-native equivalents, applied by
#: :func:`load_config` so a reference deployment's YAML loads UNCHANGED
#: (docs/MIGRATION.md "Key → key changes" — the loader performs the
#: table). Direct ``AudioRAGConfig(**...)`` construction stays strict.
_REFERENCE_ALIASES: dict[tuple[str, str], dict[str, Any]] = {
    ("asr", "backend"): {"faster-whisper": "whisper-jax"},
    ("diarization", "backend"): {"nemo": "clustering", "pyannote": "ahc"},
    ("retrieval", "backend"): {"qdrant": "tpu"},
    ("generation", "backend"): {"ollama": "llm-jax"},
    ("generation", "model"): {
        "llama3.2:3b": "llama-3.2-3b",
        "llama3.2:1b": "llama-3.2-1b",
    },
    ("tts", "fallback_backend"): {"edge-tts": "null"},
}


def normalize_reference_config(data: dict[str, Any]) -> dict[str, Any]:
    """Map reference (CUDA-stack) config values to their TPU-native
    equivalents in place of a validation error, logging each mapping.

    ``asr.compute_type`` gets special handling: the reference's
    ``float16`` maps to the MXU-native ``bfloat16``; its ``int8``
    (CTranslate2 weight quantization) maps to ``bfloat16`` storage PLUS
    the int8 decode kernels (``cross_kv_int8`` + ``decoder_int8``) —
    the semantically matching configuration, not just a dtype rename.
    """
    for (section, key), mapping in _REFERENCE_ALIASES.items():
        sec = data.get(section)
        if isinstance(sec, dict) and sec.get(key) in mapping:
            old = sec[key]
            sec[key] = mapping[old]
            log.info("config: mapped reference %s.%s=%r -> %r",
                     section, key, old, sec[key])
    asr = data.get("asr")
    if isinstance(asr, dict):
        ct = asr.get("compute_type")
        if ct == "float16":
            asr["compute_type"] = "bfloat16"
            log.info("config: mapped reference asr.compute_type=float16 "
                     "-> bfloat16 (MXU-native)")
        elif ct == "int8":
            asr["compute_type"] = "bfloat16"
            asr.setdefault("cross_kv_int8", True)
            asr.setdefault("decoder_int8", True)
            log.info("config: mapped reference asr.compute_type=int8 -> "
                     "bfloat16 storage + int8 decode kernels")
    return data
