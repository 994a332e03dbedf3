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

    try:
        return AudioRAGConfig(**data)
    except Exception as exc:
        raise ConfigError(f"config validation failed: {exc}") from exc
