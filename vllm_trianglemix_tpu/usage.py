"""Usage stats (reference vllm/usage/usage_lib.py, 259 LoC).

The reference reports anonymized usage to a collection endpoint unless
the user opts out. This serving host is deliberately egress-free, so the
TPU build writes the SAME record to a local JSONL
(``~/.config/vllm_trianglemix_tpu/usage_stats.jsonl``) that operators
can ship through their own telemetry if they choose — nothing ever
leaves the machine by itself.

Opt-out: ``VTT_NO_USAGE_STATS=1`` or ``DO_NOT_TRACK=1`` or the marker
file ``~/.config/vllm_trianglemix_tpu/do_not_track`` (reference
VLLM_NO_USAGE_STATS / DO_NOT_TRACK semantics).
"""

from __future__ import annotations

import json
import os
import platform
import time

from vllm_trianglemix_tpu.logger import init_logger

logger = init_logger(__name__)

_CONFIG_DIR = os.path.expanduser("~/.config/vllm_trianglemix_tpu")


def usage_stats_enabled() -> bool:
    if os.environ.get("VTT_NO_USAGE_STATS", "0") == "1":
        return False
    if os.environ.get("DO_NOT_TRACK", "0") == "1":
        return False
    if os.path.exists(os.path.join(_CONFIG_DIR, "do_not_track")):
        return False
    return True


def _usage_file() -> str:
    return os.path.join(_CONFIG_DIR, "usage_stats.jsonl")


def report_usage(model_architecture: str, context: str,
                 extra: dict | None = None) -> None:
    """Append one anonymized usage record locally (best effort)."""
    if not usage_stats_enabled():
        return
    try:
        import jax

        record = {
            "timestamp": int(time.time()),
            "context": context,                 # e.g. LLM / OPENAI_SERVER
            "model_architecture": model_architecture,
            "platform": jax.default_backend(),
            "num_devices": jax.device_count(),
            "python_version": platform.python_version(),
            "jax_version": jax.__version__,
            "cpu_count": os.cpu_count(),
        }
        if extra:
            record.update(extra)
        os.makedirs(_CONFIG_DIR, exist_ok=True)
        with open(_usage_file(), "a") as f:
            f.write(json.dumps(record) + "\n")
    except Exception:  # noqa: BLE001 - telemetry must never break serving
        logger.debug("usage stats write failed", exc_info=True)
