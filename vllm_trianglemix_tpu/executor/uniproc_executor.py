"""Single-process executor: engine and worker share the process.

Reference analogue: UniProcExecutor (vllm/v1/executor/abstract.py). With
JAX SPMD one process already drives every local chip, so this is the
default for single-host serving at any TP width.
"""

from __future__ import annotations

from vllm_trianglemix_tpu.config import EngineConfig
from vllm_trianglemix_tpu.core.sched_output import (
    ModelRunnerOutput,
    SchedulerOutput,
)
from vllm_trianglemix_tpu.executor.abstract import Executor
from vllm_trianglemix_tpu.worker.worker import Worker


class UniProcExecutor(Executor):

    def __init__(self, engine_config: EngineConfig) -> None:
        self.worker = Worker(engine_config)

    def execute_model(self, scheduler_output: SchedulerOutput
                      ) -> ModelRunnerOutput:
        return self.worker.execute_model(scheduler_output)

    def execute_model_async(self, scheduler_output: SchedulerOutput):
        return self.worker.execute_model_async(scheduler_output)

    @property
    def num_kv_blocks(self) -> int:
        return self.worker.num_kv_blocks

    def compile_or_warm_up_model(self) -> None:
        self.worker.compile_or_warm_up_model()

    def save_state(self, path: str) -> None:
        self.worker.save_state(path)

    def reload_weights(self, path=None) -> None:
        self.worker.reload_weights(path)

    def profile_start(self, trace_dir: str) -> None:
        self.worker.profile_start(trace_dir)

    def profile_stop(self) -> None:
        self.worker.profile_stop()

    def sleep(self, level: int = 1) -> None:
        self.worker.sleep(level)

    def wake_up(self) -> None:
        self.worker.wake_up()

    def is_sleeping(self) -> bool:
        return self.worker.is_sleeping()

    def load_lora_adapter(self, name: str, path: str) -> None:
        self.worker.load_lora_adapter(name, path)

    def unload_lora_adapter(self, name: str) -> None:
        self.worker.unload_lora_adapter(name)

    def list_lora_adapters(self) -> list:
        return self.worker.list_lora_adapters()
