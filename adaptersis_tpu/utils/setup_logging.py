"""Process-aware logging setup (reference: dinov2/logging/__init__.py:17-80 —
glog-style formatter, stdout on rank 0 only, per-rank files log.txt.rank{N}, and
the rank-0-only print patch in utils.py:452-464)."""

from __future__ import annotations

import builtins
import functools
import logging
import os
import sys
from typing import Optional

import jax


class _GlogFormatter(logging.Formatter):
    def format(self, record: logging.LogRecord) -> str:
        level = {"DEBUG": "D", "INFO": "I", "WARNING": "W", "ERROR": "E",
                 "CRITICAL": "C"}.get(record.levelname, "I")
        prefix = (f"{level}{self.formatTime(record, '%Y%m%d %H:%M:%S')} "
                  f"{record.process} {record.name} {record.filename}:{record.lineno}]")
        return f"{prefix} {record.getMessage()}"


def setup_logging(output_dir: Optional[str] = None, name: str = "adaptersis",
                  level: int = logging.INFO) -> logging.Logger:
    logger = logging.getLogger(name)
    logger.setLevel(level)
    logger.handlers.clear()
    rank = jax.process_index()
    if rank == 0:
        h = logging.StreamHandler(sys.stdout)
        h.setFormatter(_GlogFormatter())
        logger.addHandler(h)
    if output_dir:
        suffix = "" if rank == 0 else f".rank{rank}"
        fh = logging.FileHandler(os.path.join(output_dir, f"log.txt{suffix}"))
        fh.setFormatter(_GlogFormatter())
        logger.addHandler(fh)
    return logger


def patch_print_rank0(force: bool = False) -> None:
    """Rank-0-only builtin print (utils.py:452-464)."""
    builtin_print = builtins.print

    @functools.wraps(builtin_print)
    def print_(*args, **kwargs):
        if jax.process_index() == 0 or force or kwargs.pop("force", False):
            builtin_print(*args, **kwargs)

    builtins.print = print_
