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


class _Resolved:
    """Already-materialized result behind the async-dispatch interface."""

    def __init__(self, out: ModelRunnerOutput) -> None:
        self._out = out

    def get(self) -> ModelRunnerOutput:
        return self._out


class Executor(ABC):

    @staticmethod
    def get_class(engine_config: EngineConfig) -> type["Executor"]:
        if engine_config.parallel.num_hosts > 1:
            from vllm_trianglemix_tpu.executor.multihost_executor import (
                MultiHostExecutor,
            )

            return MultiHostExecutor
        from vllm_trianglemix_tpu.executor.uniproc_executor import (
            UniProcExecutor,
        )

        return UniProcExecutor

    @abstractmethod
    def __init__(self, engine_config: EngineConfig) -> None: ...

    @abstractmethod
    def execute_model(self, scheduler_output: SchedulerOutput
                      ) -> ModelRunnerOutput: ...

    def execute_model_async(self, scheduler_output: SchedulerOutput):
        """Dispatch the step without waiting for device results. Returns a
        pending handle whose ``get()`` yields the ModelRunnerOutput. The
        default wraps the blocking path (no overlap)."""
        out = self.execute_model(scheduler_output)
        return _Resolved(out)

    @property
    @abstractmethod
    def num_kv_blocks(self) -> int: ...

    def compile_or_warm_up_model(self) -> None: ...

    def save_state(self, path: str) -> None: ...

    def reload_weights(self, path=None) -> None: ...

    def profile_start(self, trace_dir: str) -> None: ...

    def profile_stop(self) -> None: ...

    def sleep(self, level: int = 1) -> None:
        raise NotImplementedError

    def wake_up(self) -> None:
        raise NotImplementedError

    def is_sleeping(self) -> bool:
        return False

    def load_lora_adapter(self, name: str, path: str) -> None:
        raise NotImplementedError

    def unload_lora_adapter(self, name: str) -> None:
        raise NotImplementedError

    def list_lora_adapters(self) -> list:
        return []

    def shutdown(self) -> None: ...
