"""Logging setup for elektronn3_tpu.

Behavioral parity with the reference logger (elektronn3/logger.py:17-66):
a singleton package logger with a colored console stream handler at INFO
and a rotating per-run file handler at DEBUG that can be migrated into a
training run directory once it is known.
"""

import logging
import os
import tempfile
from typing import Optional

_LOGGER_NAME = "elektronn3_tpu"

_ANSI = {
    logging.DEBUG: "\033[36m",     # cyan
    logging.INFO: "\033[32m",      # green
    logging.WARNING: "\033[33m",   # yellow
    logging.ERROR: "\033[31m",     # red
    logging.CRITICAL: "\033[1;31m",
}
_RESET = "\033[0m"


class _ColorFormatter(logging.Formatter):
    def format(self, record: logging.LogRecord) -> str:
        msg = super().format(record)
        if os.isatty(2):
            color = _ANSI.get(record.levelno, "")
            return f"{color}{msg}{_RESET}"
        return msg


def logger_setup() -> logging.Logger:
    """Create (or return) the singleton package logger."""
    logger = logging.getLogger(_LOGGER_NAME)
    if logger.handlers:
        return logger
    logger.setLevel(logging.DEBUG)
    logger.propagate = False

    sh = logging.StreamHandler()
    sh.setLevel(logging.INFO)
    sh.setFormatter(_ColorFormatter("[%(asctime)s] [%(levelname)s] %(message)s",
                                    datefmt="%H:%M:%S"))
    logger.addHandler(sh)

    try:
        tmpfile = tempfile.NamedTemporaryFile(
            prefix="elektronn3tpu_", suffix=".log", delete=False)
        fh = logging.FileHandler(tmpfile.name)
        fh.setLevel(logging.DEBUG)
        fh.setFormatter(logging.Formatter(
            "[%(asctime)s] [%(name)s] [%(levelname)s] %(message)s"))
        logger.addHandler(fh)
    except OSError:
        pass
    return logger


def change_log_file_to(new_path: str) -> None:
    """Migrate the DEBUG file handler into a run directory.

    Mirrors trainer.py:66-89 of the reference: once the training run dir
    exists, the log file moves there so each run keeps its own full log.
    """
    logger = logging.getLogger(_LOGGER_NAME)
    for h in list(logger.handlers):
        if isinstance(h, logging.FileHandler):
            old_path = h.baseFilename
            logger.removeHandler(h)
            h.close()
            try:
                with open(old_path) as f_old, open(new_path, "a") as f_new:
                    f_new.write(f_old.read())
                os.remove(old_path)
            except OSError:
                pass
    fh = logging.FileHandler(new_path)
    fh.setLevel(logging.DEBUG)
    fh.setFormatter(logging.Formatter(
        "[%(asctime)s] [%(name)s] [%(levelname)s] %(message)s"))
    logger.addHandler(fh)


logger = logger_setup()
