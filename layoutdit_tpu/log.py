"""Structured logging for layoutdit_tpu.

Mirrors the reference's logging surface (``get_logger`` with a
``LayoutDit_`` prefix and a ``LAYOUT_LOG_LEVEL`` env override,
cf. /root/reference/src/layoutdit/log.py:14-36) but deliberately fixes
its singleton name-capture quirk (log.py:20-21 returns the *first*
module's logger to every caller): here every module gets its own child
logger under a single configured root.
"""

from __future__ import annotations

import logging
import os

_ROOT_NAME = "layoutdit_tpu"
_configured = False


def _configure_root() -> logging.Logger:
    global _configured
    root = logging.getLogger(_ROOT_NAME)
    if not _configured:
        if not root.handlers:
            handler = logging.StreamHandler()
            handler.setFormatter(
                logging.Formatter("%(name)s - %(levelname)s - %(message)s")
            )
            root.addHandler(handler)
        level_str = os.getenv("LAYOUT_LOG_LEVEL", "INFO").upper()
        root.setLevel(getattr(logging, level_str, logging.INFO))
        root.propagate = False
        _configured = True
    return root


def get_logger(name: str) -> logging.Logger:
    """Return a per-module logger under the layoutdit_tpu root."""
    _configure_root()
    if name.startswith(_ROOT_NAME):
        return logging.getLogger(name)
    return logging.getLogger(f"{_ROOT_NAME}.{name}")
