"""Model checkpoint save/restore (orbax-backed, local filesystem only).

The reference downloads weights from HuggingFace at load time
(``asr/whisper.py:55-62`` etc.); this build is zero-egress, so backends call
:func:`restore_params` with a local directory and fall back to random init
when absent. Converters from HF torch checkpoints live beside each model's
loader and run offline.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any

from audio_rag_tpu.utils.logging import get_logger

log = get_logger(__name__)

__all__ = ["save_params", "restore_params", "load_npz_asset",
           "save_npz_asset"]


def _nest(flat: dict) -> dict:
    tree: dict = {}
    for key, value in flat.items():
        node = tree
        parts = key.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value
    return tree


def _flatten(tree: dict, prefix: str = "") -> dict:
    flat: dict = {}
    for k, v in tree.items():
        key = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            flat.update(_flatten(v, key))
        else:
            flat[key] = v
    return flat


def save_npz_asset(path: str | Path, params: Any) -> None:
    """Persist a small param pytree as one committed ``.npz`` asset
    (slash-joined keys — the format of ``audio_rag_tpu/assets/*.npz``)."""
    import numpy as np

    np.savez_compressed(
        path, **{k: np.asarray(v) for k, v in _flatten(params).items()}
    )


def load_npz_asset(path: str | Path) -> Any | None:
    """Load a committed ``.npz`` asset back into a nested pytree;
    ``None`` when the file is missing."""
    import numpy as np

    p = Path(path)
    if not p.exists():
        return None
    with np.load(p) as data:
        return _nest({k: data[k] for k in data.files})


def _ckpt_dir(path: str | Path, name: str) -> Path:
    return Path(path).expanduser().resolve() / name


def save_params(path: str | Path, name: str, params: Any) -> None:
    """Persist a param pytree under ``{path}/{name}``."""
    import orbax.checkpoint as ocp

    d = _ckpt_dir(path, name)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(d, params, force=True)


def restore_params(path: str | Path, name: str) -> Any | None:
    """Restore a param pytree from ``{path}/{name}``; None when missing."""
    import orbax.checkpoint as ocp

    d = _ckpt_dir(path, name)
    if not d.exists():
        return None
    try:
        with ocp.StandardCheckpointer() as ckptr:
            return ckptr.restore(d)
    except Exception as exc:
        log.warning("checkpoint restore failed at %s: %s", d, exc)
        return None
