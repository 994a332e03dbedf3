"""Logging setup. Parity: reference ``utils/logging.py:12-52``."""

from __future__ import annotations

import logging
import sys

_CONFIGURED = False

#: chatty third-party loggers quieted to WARNING
_NOISY = ["jax", "jax._src", "absl", "httpx", "websockets", "urllib3"]


def setup_logging(level: str = "INFO", fmt: str | None = None) -> None:
    """Configure root logging once; safe to call repeatedly."""
    global _CONFIGURED
    root = logging.getLogger()
    root.setLevel(getattr(logging, level.upper(), logging.INFO))
    if not _CONFIGURED:
        handler = logging.StreamHandler(sys.stderr)
        handler.setFormatter(
            logging.Formatter(
                fmt or "%(asctime)s %(levelname)-7s %(name)s: %(message)s",
                datefmt="%H:%M:%S",
            )
        )
        root.addHandler(handler)
        for name in _NOISY:
            logging.getLogger(name).setLevel(logging.WARNING)
        _CONFIGURED = True


def get_logger(name: str) -> logging.Logger:
    return logging.getLogger(name)
