"""Structured run logger (driver-side).

Reference parity: ``/root/reference/src/utils/logger.py`` (ModuleLogger)
gives each module a console+file logger with a custom SUCCESS level,
ANSI color on TTYs only, and a per-run overwritten log file. This is
the Spark-first twin with one architectural difference: it configures
the *driver* process only. Executor-side logging in Spark goes through
the JVM's log4j2 configuration (``spark.executor.extraJavaOptions
-Dlog4j.configurationFile=...``), never through Python's ``logging`` —
a Python handler attached here would silently not exist on executors,
so this module does not pretend otherwise.

Usage::

    from data_engineering_challenge_spark.runlog import get_logger
    log = get_logger(__name__, log_dir="logs")
    log.info("loading %s", path)
    log.success("ingest complete: %d rows", n)   # custom level 25
"""

from __future__ import annotations

import logging
import sys
from pathlib import Path

SUCCESS = 25  # between INFO (20) and WARNING (30), mirroring the reference
logging.addLevelName(SUCCESS, "SUCCESS")

_RESET = "\033[0m"
_COLORS = {
    logging.ERROR: "\033[31m",
    logging.CRITICAL: "\033[31m",
    logging.WARNING: "\033[33m",
    SUCCESS: "\033[32m",
}

_FMT = "%(asctime)s | %(levelname)s | %(name)s: %(message)s"
_DATEFMT = "%Y-%m-%d %H:%M:%S"


class _TtyColorFormatter(logging.Formatter):
    """Wrap the whole formatted line in the level's ANSI color.

    Only ever installed on a handler whose stream is a TTY; file
    handlers get a plain Formatter so logs stay grep-able.
    """

    def format(self, record: logging.LogRecord) -> str:
        line = super().format(record)
        color = _COLORS.get(record.levelno, "")
        return f"{color}{line}{_RESET}" if color else line


def _success(self: logging.Logger, msg: str, *args, **kwargs) -> None:
    if self.isEnabledFor(SUCCESS):
        self._log(SUCCESS, msg, args, **kwargs)


# Bind once on the Logger class: every logger (existing or future) gets
# .success() without per-instance monkey-patching.
if not hasattr(logging.Logger, "success"):
    logging.Logger.success = _success  # type: ignore[attr-defined]


def get_logger(
    name: str,
    log_dir: str | Path | None = None,
    filename: str = "run.log",
    level: int = logging.INFO,
    overwrite: bool = True,
) -> logging.Logger:
    """Module-scoped logger: colored console + optional plain file.

    Idempotent per name — repeat calls return the configured logger
    without stacking duplicate handlers. ``overwrite=True`` truncates
    the file each run (the reference's per-run log semantics);
    ``log_dir=None`` skips the file handler entirely (test/driver
    runs where stdout capture is the artifact).
    """
    logger = logging.getLogger(name)
    if logger.handlers:
        return logger
    logger.setLevel(level)
    logger.propagate = False

    console = logging.StreamHandler(sys.stdout)
    console.setLevel(level)
    if sys.stdout.isatty():
        console.setFormatter(_TtyColorFormatter(_FMT, _DATEFMT))
    else:
        console.setFormatter(logging.Formatter(_FMT, _DATEFMT))
    logger.addHandler(console)

    if log_dir is not None:
        path = Path(log_dir)
        path.mkdir(parents=True, exist_ok=True)
        fh = logging.FileHandler(
            path / filename, mode="w" if overwrite else "a", encoding="utf-8"
        )
        fh.setLevel(level)
        fh.setFormatter(logging.Formatter(_FMT, _DATEFMT))
        logger.addHandler(fh)
    return logger
