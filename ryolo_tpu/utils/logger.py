"""Console + TensorBoard logging.

Equivalent of ``lib/logger.py``: a colored console logger (ANSI, no
colorlog dependency) and a TensorBoard scalar writer with the same
``list_of_scalars_summary`` API (``lib/logger.py:6-14``).  TensorBoard is
optional — absent, scalars are appended to a JSONL file so headless TPU
runs still record metrics.
"""

from __future__ import annotations

import json
import logging
import os
import sys
import time

_COLORS = {
    "DEBUG": "\033[34m",
    "INFO": "\033[0m",
    "WARNING": "\033[33m",
    "ERROR": "\033[31m",
    "CRITICAL": "\033[31m",
}
_RESET = "\033[0m"


class _ColorFormatter(logging.Formatter):
    def format(self, record):
        color = _COLORS.get(record.levelname, "") if sys.stderr.isatty() else ""
        reset = _RESET if color else ""
        ts = time.strftime("%Y-%m-%d %H:%M:%S", time.localtime(record.created))
        return f"{ts} {color}{record.levelname:<8}{reset} {record.getMessage()}"


def setup_logger(name: str = "ryolo_tpu") -> logging.Logger:
    log = logging.getLogger(name)
    if not log.handlers:
        h = logging.StreamHandler()
        h.setFormatter(_ColorFormatter())
        h.setLevel(logging.INFO)
        log.addHandler(h)
        log.setLevel(logging.INFO)
        log.propagate = False
    return log


logger = setup_logger()


class Logger:
    """Scalar summary writer (TensorBoard if available, JSONL fallback)."""

    def __init__(self, log_dir: str):
        os.makedirs(log_dir, exist_ok=True)
        self.log_dir = log_dir
        self._writer = None
        try:
            from torch.utils.tensorboard import SummaryWriter

            self._writer = SummaryWriter(log_dir)
        except Exception:  # pragma: no cover - tensorboard optional
            self._jsonl = open(os.path.join(log_dir, "scalars.jsonl"), "a")

    def list_of_scalars_summary(self, tag_value_dictionary, step: int):
        """Same API as ``lib/logger.py:11-14``."""
        if self._writer is not None:
            for tag, value in tag_value_dictionary.items():
                self._writer.add_scalar(tag, value, global_step=step)
        else:
            rec = {"step": step}
            rec.update({k: float(v) for k, v in tag_value_dictionary.items()})
            self._jsonl.write(json.dumps(rec) + "\n")
            self._jsonl.flush()
