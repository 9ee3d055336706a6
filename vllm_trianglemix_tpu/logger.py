"""Structured logging for the engine.

Mirrors the role of the reference's ``vllm/logger.py`` (env-tunable level,
per-module loggers) without its torch coupling.
"""

import logging
import os
import sys

_FORMAT = "%(levelname)s %(asctime)s [%(name)s:%(lineno)d] %(message)s"
_DATEFMT = "%m-%d %H:%M:%S"

_root_configured = False


def _configure_root() -> None:
    global _root_configured
    if _root_configured:
        return
    level = os.environ.get("VTT_LOGGING_LEVEL", "INFO").upper()
    handler = logging.StreamHandler(sys.stderr)
    handler.setFormatter(logging.Formatter(_FORMAT, datefmt=_DATEFMT))
    root = logging.getLogger("vllm_trianglemix_tpu")
    root.setLevel(level)
    root.addHandler(handler)
    root.propagate = False
    _root_configured = True


def init_logger(name: str) -> logging.Logger:
    _configure_root()
    return logging.getLogger(name)
