"""File + console logger (reference AiR/utils/logger.py:3-26)."""

from __future__ import annotations

import logging
import sys


def Logger(log_file: str, level=logging.INFO) -> logging.Logger:
    logger = logging.getLogger(log_file)
    logger.setLevel(level)
    logger.handlers.clear()
    fmt = logging.Formatter("%(asctime)s %(levelname)s %(message)s")
    fh = logging.FileHandler(log_file)
    fh.setFormatter(fmt)
    sh = logging.StreamHandler(sys.stdout)
    sh.setFormatter(fmt)
    logger.addHandler(fh)
    logger.addHandler(sh)
    logger.propagate = False
    return logger
