"""Colored console printing + file loggers (reference: pySLAM
``pyslam/utilities/logging.py`` ``Printer``/``Logging``).  The reference's
cross-process ``LoggerQueue`` is unnecessary here — the TPU build is a single
host process — so module loggers write straight to per-module files.
"""

from __future__ import annotations

import logging
import os
import sys


class Colors:
    RESET = "\033[0m"
    RED = "\033[31m"
    GREEN = "\033[32m"
    YELLOW = "\033[33m"
    BLUE = "\033[34m"
    MAGENTA = "\033[35m"
    CYAN = "\033[36m"
    BOLD = "\033[1m"


def _tty() -> bool:
    return sys.stdout.isatty()


class Printer:
    @staticmethod
    def _p(color, *args):
        msg = " ".join(str(a) for a in args)
        if _tty():
            print(f"{color}{msg}{Colors.RESET}")
        else:
            print(msg)

    @staticmethod
    def red(*args):
        Printer._p(Colors.RED, *args)

    @staticmethod
    def green(*args):
        Printer._p(Colors.GREEN, *args)

    @staticmethod
    def yellow(*args):
        Printer._p(Colors.YELLOW, *args)

    @staticmethod
    def blue(*args):
        Printer._p(Colors.BLUE, *args)

    @staticmethod
    def cyan(*args):
        Printer._p(Colors.CYAN, *args)

    @staticmethod
    def gray(*args):
        Printer._p(Colors.CYAN, *args)

    @staticmethod
    def orange(*args):
        Printer._p(Colors.YELLOW, *args)

    @staticmethod
    def error(*args):
        Printer._p(Colors.RED + Colors.BOLD, "[ERROR]", *args)

    @staticmethod
    def warning(*args):
        Printer._p(Colors.YELLOW, "[WARNING]", *args)


class Logging:
    """Per-module file loggers under ./logs (reference writes kf_info.log,
    local_mapping.log, loop_closing.log, ...)."""

    _loggers: dict = {}
    logs_dir = "logs"

    @classmethod
    def setup_file_logger(cls, name: str, filename: str | None = None,
                          level=logging.INFO) -> logging.Logger:
        if name in cls._loggers:
            return cls._loggers[name]
        os.makedirs(cls.logs_dir, exist_ok=True)
        logger = logging.getLogger(f"pyslam_tpu.{name}")
        logger.setLevel(level)
        logger.propagate = False
        fh = logging.FileHandler(
            os.path.join(cls.logs_dir, filename or f"{name}.log"), mode="w"
        )
        fh.setFormatter(logging.Formatter("%(asctime)s %(levelname)s %(message)s"))
        logger.addHandler(fh)
        cls._loggers[name] = logger
        return logger
