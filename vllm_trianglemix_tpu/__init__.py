"""vllm-trianglemix-tpu: a TPU-native LLM serving engine.

Built from scratch in JAX/XLA/Pallas with the capabilities of the reference
``ackerm0n/vllm-trianglemix`` (vLLM v0.11.0 + TriangleMix sparse attention).
See SURVEY.md at the repo root for the structural blueprint.
"""

from vllm_trianglemix_tpu.sampling_params import SamplingParams
from vllm_trianglemix_tpu.config import (
    CacheConfig,
    EngineConfig,
    ModelConfig,
    ParallelConfig,
    SchedulerConfig,
    TriangleMixConfig,
)

__version__ = "0.1.0"


def __getattr__(name):
    # Lazy import of the heavyweight entrypoint (pulls in jax).
    if name == "LLM":
        from vllm_trianglemix_tpu.entrypoints.llm import LLM

        return LLM
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


__all__ = [
    "LLM",
    "SamplingParams",
    "EngineConfig",
    "ModelConfig",
    "CacheConfig",
    "SchedulerConfig",
    "ParallelConfig",
    "TriangleMixConfig",
    "__version__",
]
