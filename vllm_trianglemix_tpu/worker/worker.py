"""Worker: owns the device(s), the model runner, and the KV cache.

Role of the reference's TPUWorker (vllm/v1/worker/tpu_worker.py): device
init, model load, KV sizing, warmup, execute_model. In the JAX engine a
"worker" is a host process driving one jax runtime (all local chips via one
mesh); multi-host scale-out wires N workers via jax.distributed.
"""

from __future__ import annotations

from typing import Optional

import jax

from vllm_trianglemix_tpu.config import EngineConfig
from vllm_trianglemix_tpu.core.sched_output import (
    ModelRunnerOutput,
    SchedulerOutput,
)
from vllm_trianglemix_tpu.logger import init_logger
from vllm_trianglemix_tpu.worker.model_runner import ModelRunner

logger = init_logger(__name__)

_CACHE_WIRED = False


def _enable_compilation_cache() -> None:
    """Point JAX's persistent compilation cache at VTT_XLA_CACHE_PATH so
    warm restarts skip XLA/Mosaic compiles (reference: VLLM_XLA_CACHE_PATH,
    vllm/platforms/tpu.py). Empty value disables."""
    global _CACHE_WIRED
    if _CACHE_WIRED:
        return
    _CACHE_WIRED = True
    from vllm_trianglemix_tpu import envs

    path = envs.VTT_XLA_CACHE_PATH
    if not path:
        return
    try:
        platforms = jax.config.jax_platforms or ""
    except Exception:  # noqa: BLE001
        platforms = ""
    if platforms.split(",")[0] == "cpu":
        # CPU compiles are cheap, and persisted XLA:CPU AOT artifacts are
        # machine-feature-pinned (reloading them on a different host
        # warns about SIGILL risk). Cache only accelerator compiles.
        return
    try:
        import os

        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        # Cache every compile, even fast ones — decode-kernel Mosaic
        # compiles are individually cheap but numerous.
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        logger.info("XLA compilation cache at %s", path)
    except Exception as e:  # pragma: no cover - cache is best-effort
        logger.warning("compilation cache disabled: %s", e)


class Worker:

    def __init__(self, engine_config: EngineConfig) -> None:
        self.engine_config = engine_config
        _enable_compilation_cache()
        self.mesh = None
        if engine_config.parallel.world_size > 1:
            self.mesh = self._make_mesh(engine_config)
        self.model_runner = ModelRunner(engine_config, mesh=self.mesh)

    @staticmethod
    def _make_mesh(engine_config: EngineConfig):
        from vllm_trianglemix_tpu.parallel.mesh import make_mesh

        p = engine_config.parallel
        return make_mesh(tp=p.tensor_parallel_size,
                         dp=p.data_parallel_size,
                         cp=p.context_parallel_size,
                         pp=p.pipeline_parallel_size)

    @property
    def num_kv_blocks(self) -> int:
        return self.model_runner.num_kv_blocks

    def compile_or_warm_up_model(self) -> None:
        self.model_runner.capture_graphs()

    def execute_model(self, scheduler_output: SchedulerOutput
                      ) -> ModelRunnerOutput:
        return self.model_runner.execute_model(scheduler_output)

    def execute_model_async(self, scheduler_output: SchedulerOutput):
        return self.model_runner.execute_model_async(scheduler_output)

    def save_state(self, path: str) -> None:
        self.model_runner.save_state(path)

    def reload_weights(self, path=None) -> None:
        self.model_runner.reload_weights(path)

    def profile_start(self, trace_dir: str) -> None:
        jax.profiler.start_trace(trace_dir)

    def profile_stop(self) -> None:
        jax.profiler.stop_trace()

    def sleep(self, level: int = 1) -> None:
        self.model_runner.sleep(level)

    def wake_up(self) -> None:
        self.model_runner.wake_up()

    def is_sleeping(self) -> bool:
        return self.model_runner.is_sleeping()

    def load_lora_adapter(self, name: str, path: str) -> None:
        self.model_runner.load_lora_adapter(name, path)

    def unload_lora_adapter(self, name: str) -> None:
        self.model_runner.unload_lora_adapter(name)

    def list_lora_adapters(self) -> list[str]:
        return self.model_runner.list_lora_adapters()
