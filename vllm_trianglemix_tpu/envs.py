"""Lazy environment flags.

Mirrors the reference's ``vllm/envs.py`` pattern (lazy ``VLLM_*`` lookups,
reference envs.py:364-1483) with a much smaller surface. All flags use the
``VTT_`` prefix; the TriangleMix flags documented (but unimplemented) in the
reference (``trianglemix_config.py:106-110``) are implemented here for real.
"""

import os
from typing import Any, Callable

environment_variables: dict[str, Callable[[], Any]] = {
    # --- TriangleMix (reference TRIANGLEMIX_QUICK_REFERENCE.md:285-289) ---
    # Enable TriangleMix sparse attention globally.
    "VTT_TRIANGLEMIX_ENABLED": lambda: bool(
        int(os.getenv("VTT_TRIANGLEMIX_ENABLED", "0"))
    ),
    # Number of triangle layers (first-N policy) when enabled via env.
    "VTT_TRIANGLEMIX_LAYERS": lambda: int(os.getenv("VTT_TRIANGLEMIX_LAYERS", "0")),
    # --- Engine ---
    # Assert the number of compiled graphs stays fixed after warmup
    # (reference: VLLM_XLA_CHECK_RECOMPILATION, tpu_model_runner.py:308-332).
    "VTT_CHECK_RECOMPILATION": lambda: bool(
        int(os.getenv("VTT_CHECK_RECOMPILATION", "0"))
    ),
    # Persistent XLA compile cache dir (reference: VLLM_XLA_CACHE_PATH).
    "VTT_XLA_CACHE_PATH": lambda: os.getenv(
        "VTT_XLA_CACHE_PATH", os.path.expanduser("~/.cache/vtt_xla_cache")
    ),
    # Fraction of HBM usable for weights+KV cache.
    "VTT_MEMORY_UTILIZATION": lambda: float(
        os.getenv("VTT_MEMORY_UTILIZATION", "0.9")
    ),
    # Override total device HBM bytes when PJRT memory_stats is missing
    # (0 = autodetect from device kind).
    "VTT_HBM_BYTES": lambda: int(os.getenv("VTT_HBM_BYTES", "0")),
    # Force pallas kernels into interpret mode (CPU debugging).
    "VTT_PALLAS_INTERPRET": lambda: bool(int(os.getenv("VTT_PALLAS_INTERPRET", "0"))),
    # Disable in-repo Pallas kernels entirely (fall back to XLA-native ops).
    "VTT_DISABLE_PALLAS": lambda: bool(int(os.getenv("VTT_DISABLE_PALLAS", "0"))),
    # Disable the decode-specialized attention kernel (fall back to the
    # general ragged kernel's fused-decode mode) — perf A/B escape hatch.
    "VTT_DISABLE_DECODE_KERNEL": lambda: bool(
        int(os.getenv("VTT_DISABLE_DECODE_KERNEL", "0"))
    ),
    # Opt IN to the Pallas MLA latent kernel. Default off: the honest
    # differenced-chain harness (scripts/bench_mla_decode.py, round 5)
    # measures the kernel ~5x SLOWER than the XLA gather path at the
    # DeepSeek decode shape (135 vs 22 us/layer v2-lite, 266 vs 63 v3)
    # — the round-4 ">=20x" claim was a dispatch-timing artifact.
    "VTT_MLA_KERNEL": lambda: bool(int(os.getenv("VTT_MLA_KERNEL", "0"))),
    # Logging level for the engine's loggers.
    "VTT_LOGGING_LEVEL": lambda: os.getenv("VTT_LOGGING_LEVEL", "INFO"),
    # Plugin allow-list (plugins.py; reference VLLM_PLUGINS): unset =
    # load all registered vtt.general_plugins entry points, "" = none.
    "VTT_PLUGINS": lambda: os.getenv("VTT_PLUGINS"),
    # Opt out of LOCAL usage-stats records (usage.py; reference
    # VLLM_NO_USAGE_STATS — nothing is transmitted either way).
    "VTT_NO_USAGE_STATS": lambda: bool(
        int(os.getenv("VTT_NO_USAGE_STATS", "0"))
    ),
    # Use the C++ host runtime extension (block pool index) when built.
    "VTT_USE_NATIVE_RUNTIME": lambda: bool(
        int(os.getenv("VTT_USE_NATIVE_RUNTIME", "1"))
    ),
}


def __getattr__(name: str) -> Any:
    if name in environment_variables:
        return environment_variables[name]()
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


def __dir__() -> list[str]:
    return list(environment_variables.keys())
