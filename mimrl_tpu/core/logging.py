"""Logging + scalar telemetry.

- `set_logger` / `log_message`: file + stdout logging
  (ref: Utils.py:52-67).
- `ScalarWriter`: TensorBoard-compatible scalar sink. Uses
  torch.utils.tensorboard when the tensorboard package is importable
  (same channels as ref: Solver.py:467-507) and always writes a JSONL
  mirror (`scalars.jsonl`) so telemetry survives without TB.
"""

from __future__ import annotations

import json
import logging
import os
from typing import Optional


def set_logger(log_path: str) -> None:
    """Attach file+stream handlers for this run. Idempotent per path and
    robust to foreign handlers (pytest, absl): our handlers are tagged
    and replaced instead of the reference's bare `if not logger.handlers`
    check (ref: Utils.py:52-63), which silently skips the file handler
    when anything else configured logging first.

    Uses the dedicated 'mimrl' logger, NOT the root logger: a DEBUG root
    logger pulls every jax/XLA debug message into Running.log (hundreds
    of lines per compile) and burns host time formatting them."""
    logger = logging.getLogger("mimrl")
    logger.setLevel(logging.DEBUG)
    logger.propagate = False  # keep run logs out of foreign root handlers
    # third-party atexit debug logs (jax backend teardown) may fire after
    # the run dir is gone; don't let a closed file handler raise
    logging.raiseExceptions = False
    for h in list(logger.handlers):
        if getattr(h, "_mimrl_handler", False):
            logger.removeHandler(h)
            h.close()
    file_handler = logging.FileHandler(log_path)
    file_handler.setFormatter(
        logging.Formatter("%(asctime)s:%(levelname)s: %(message)s"))
    file_handler._mimrl_handler = True
    logger.addHandler(file_handler)
    stream_handler = logging.StreamHandler()
    stream_handler.setFormatter(logging.Formatter("%(message)s"))
    stream_handler._mimrl_handler = True
    logger.addHandler(stream_handler)


def log_message(message: str) -> None:
    logging.getLogger("mimrl").log(msg=message, level=logging.DEBUG)


class ScalarWriter:
    def __init__(self, log_dir: str):
        os.makedirs(log_dir, exist_ok=True)
        self._jsonl = open(os.path.join(log_dir, "scalars.jsonl"), "a")
        self._tb = None
        try:
            from torch.utils.tensorboard import SummaryWriter

            self._tb = SummaryWriter(log_dir)
        except Exception:
            self._tb = None

    def add_scalar(self, tag: str, value: float, step: int) -> None:
        self._jsonl.write(json.dumps(
            {"tag": tag, "value": float(value), "step": int(step)}) + "\n")
        if self._tb is not None:
            self._tb.add_scalar(tag, value, step)

    def flush(self) -> None:
        self._jsonl.flush()
        if self._tb is not None:
            self._tb.flush()

    def close(self) -> None:
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()
