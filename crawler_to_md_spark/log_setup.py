"""Leveled, colored logging — reference parity for log_setup.py:1-80.

The reference configures a root logger with a coloredlogs formatter and a
tqdm-aware stream handler, level taken from the LOG_LEVEL environment
variable (reference cli.py:12-13). Neither coloredlogs nor tqdm is baked
into this sandbox, so the colored formatter is a small ANSI fallback with
the same record layout; if coloredlogs IS importable (real deployments),
it is used directly.
"""

from __future__ import annotations

import logging
import os
import sys

_FMT = (
    "%(asctime)s %(filename)s:%(lineno)d %(name)s[%(process)d] "
    "%(levelname)s %(message)s"
)

_LEVEL_COLORS = {
    "DEBUG": "\x1b[36m",     # cyan
    "INFO": "\x1b[32m",      # green
    "WARNING": "\x1b[33m",   # yellow
    "ERROR": "\x1b[31m",     # red
    "CRITICAL": "\x1b[35m",  # magenta
}
_RESET = "\x1b[0m"


class _StderrHandler(logging.StreamHandler):
    """Resolves sys.stderr at EMIT time (like logging._StderrHandler) so
    stream redirection — pytest capsys, tqdm writers — keeps working."""

    def __init__(self):
        logging.Handler.__init__(self)

    @property
    def stream(self):
        return sys.stderr


class _AnsiFormatter(logging.Formatter):
    def format(self, record: logging.LogRecord) -> str:
        msg = super().format(record)
        if sys.stderr.isatty():
            color = _LEVEL_COLORS.get(record.levelname, "")
            if color:
                return f"{color}{msg}{_RESET}"
        return msg


def setup_logging(log_level: str | None = None) -> logging.Logger:
    """Configure the package root logger (idempotent). Level resolution:
    explicit arg > LOG_LEVEL env var > WARN (reference cli.py:12)."""
    level = (log_level or os.getenv("LOG_LEVEL", "WARN")).upper()
    if level == "WARN":
        level = "WARNING"
    logger = logging.getLogger("crawler_to_md_spark")
    if not logger.handlers:
        handler = _StderrHandler()
        try:  # real deployments: the reference's exact formatter
            import coloredlogs

            handler.setFormatter(coloredlogs.ColoredFormatter(_FMT))
        except ImportError:
            handler.setFormatter(_AnsiFormatter(_FMT))
        logger.addHandler(handler)
        logger.propagate = False
    logger.setLevel(level)
    return logger


def get_logger(name: str | None = None) -> logging.Logger:
    base = logging.getLogger("crawler_to_md_spark")
    if not base.handlers:
        setup_logging()
    return base if name is None else base.getChild(name)
