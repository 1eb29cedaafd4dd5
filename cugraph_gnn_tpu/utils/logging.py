"""Leveled logging (ref cpp/src/logger.{hpp,cpp}: WHOLEMEMORY_LOG with
levels FATAL..TRACE, settable at init — ref wholememory.h:75-82,
initialize.py:18-25)."""

from __future__ import annotations

import logging
import sys

LEVELS = {
    "fatal": logging.CRITICAL,
    "error": logging.ERROR,
    "warn": logging.WARNING,
    "info": logging.INFO,
    "debug": logging.DEBUG,
    "trace": logging.DEBUG - 5,
}

logging.addLevelName(LEVELS["trace"], "TRACE")

_logger = logging.getLogger("cugraph_gnn_tpu")


def set_log_level(level: str = "info"):
    """ref --log-level flag (common_options.py:67-72)."""
    _logger.setLevel(LEVELS[level.lower()])
    if not _logger.handlers:
        h = logging.StreamHandler(sys.stderr)
        h.setFormatter(logging.Formatter(
            "[%(levelname)s][%(asctime)s] %(message)s", "%H:%M:%S"))
        _logger.addHandler(h)


def get_logger() -> logging.Logger:
    if not _logger.handlers:
        set_log_level("info")
    return _logger
