"""Executor abstraction (reference vllm/v1/executor/abstract.py:24).

On TPU+JAX a single process drives all local chips through one mesh, so the
uniproc executor is the workhorse; a multi-host executor (one process per
host, jax.distributed) plugs in behind the same interface.
"""

from __future__ import annotations

from abc import ABC, abstractmethod

from vllm_trianglemix_tpu.config import EngineConfig
from vllm_trianglemix_tpu.core.sched_output import (
    ModelRunnerOutput,
    SchedulerOutput,
)


class Executor(ABC):

    @staticmethod
    def get_class(engine_config: EngineConfig) -> type["Executor"]:
        from vllm_trianglemix_tpu.executor.uniproc_executor import (
            UniProcExecutor,
        )

        return UniProcExecutor

    @abstractmethod
    def __init__(self, engine_config: EngineConfig) -> None: ...

    @abstractmethod
    def execute_model(self, scheduler_output: SchedulerOutput
                      ) -> ModelRunnerOutput: ...

    @property
    @abstractmethod
    def num_kv_blocks(self) -> int: ...

    def compile_or_warm_up_model(self) -> None: ...

    def save_state(self, path: str) -> None: ...

    def reload_weights(self, path=None) -> None: ...

    def profile_start(self, trace_dir: str) -> None: ...

    def profile_stop(self) -> None: ...

    def shutdown(self) -> None: ...
