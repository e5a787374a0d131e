"""Global experiment logger with ANSI color helpers.

Behavioral counterpart of the reference's ``utils/loggers.py:14-141``:
a process-wide singleton logger keyed by experiment name, console + optional
file handlers, and a tiny color helper ``C``.
"""

from __future__ import annotations

import logging
import sys
from pathlib import Path
from typing import Optional

_GLOBAL_LOGGERS = {}
_DEFAULT_NAME = "pemp_tpu"


class C:
    HEADER = "\033[95m"
    OKBLUE = "\033[94m"
    OKGREEN = "\033[92m"
    WARNING = "\033[93m"
    FAIL = "\033[91m"
    BOLD = "\033[1m"
    UNDERLINE = "\033[4m"
    ENDC = "\033[0m"

    @staticmethod
    def c(text: str, color: str) -> str:
        return f"{color}{text}{C.ENDC}"


def create_logger(name: str,
                  log_file: Optional[Path] = None,
                  level: int = logging.INFO) -> logging.Logger:
    logger = logging.getLogger(name)
    logger.setLevel(level)
    logger.propagate = False
    if not logger.handlers:
        console = logging.StreamHandler(sys.stdout)
        console.setFormatter(logging.Formatter(
            "%(asctime)s %(levelname).1s %(message)s", datefmt="%H:%M:%S"))
        logger.addHandler(console)
    if log_file is not None:
        log_file = Path(log_file)
        log_file.parent.mkdir(parents=True, exist_ok=True)
        fh = logging.FileHandler(str(log_file))
        fh.setFormatter(logging.Formatter(
            "%(asctime)s %(levelname)s %(message)s"))
        logger.addHandler(fh)
    return logger


def get_global_logger(name: Optional[str] = None,
                      log_file: Optional[Path] = None) -> logging.Logger:
    """Return (and lazily create) the process-wide logger for ``name``."""
    key = name or _DEFAULT_NAME
    if key not in _GLOBAL_LOGGERS:
        _GLOBAL_LOGGERS[key] = create_logger(key, log_file=log_file)
    return _GLOBAL_LOGGERS[key]
