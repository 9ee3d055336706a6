"""Synchronous engine facade (reference vllm/v1/engine/llm_engine.py:45)."""

from __future__ import annotations

import os
from typing import Optional, Union

from vllm_trianglemix_tpu.config import EngineConfig
from vllm_trianglemix_tpu.engine.core import EngineCore
from vllm_trianglemix_tpu.engine.output_processor import OutputProcessor
from vllm_trianglemix_tpu.engine.processor import Processor, load_tokenizer
from vllm_trianglemix_tpu.logger import init_logger
from vllm_trianglemix_tpu.metrics.stats import IterationStats
from vllm_trianglemix_tpu.outputs import RequestOutput
from vllm_trianglemix_tpu.sampling_params import SamplingParams

logger = init_logger(__name__)


class LLMEngine:

    def __init__(self, engine_config: EngineConfig) -> None:
        from vllm_trianglemix_tpu.plugins import load_general_plugins

        load_general_plugins()
        self.engine_config = engine_config

        tokenizer = None
        if not engine_config.model.skip_tokenizer_init:
            tok_path = engine_config.model.tokenizer
            if tok_path and os.path.isdir(tok_path):
                tokenizer = load_tokenizer(tok_path)
        self.tokenizer = tokenizer

        dp_size = engine_config.parallel.data_parallel_size
        if engine_config.multiprocess_engine and dp_size > 1:
            from vllm_trianglemix_tpu.engine.dp_coordinator import (
                DPEngineClient,
            )

            self.engine_core = DPEngineClient(engine_config, dp_size)
        elif engine_config.multiprocess_engine:
            from vllm_trianglemix_tpu.engine.core_proc import (
                EngineCoreClient,
            )

            self.engine_core = EngineCoreClient(engine_config)
        else:
            self.engine_core = EngineCore(engine_config)
        self.processor = Processor(engine_config, tokenizer)
        if self.processor.eos_token_id is None:
            # The model config knows the eos id even without a tokenizer
            # (host-side config parse — works for the MP engine too).
            try:
                from vllm_trianglemix_tpu.models.registry import (
                    resolve_model,
                )

                _, model_cfg = resolve_model(engine_config.model.model)
                self.processor.eos_token_id = model_cfg.eos_token_id
            except Exception:  # noqa: BLE001
                pass
        self.output_processor = OutputProcessor(tokenizer)

        # Local-only usage record (usage.py; reference usage_lib.py).
        try:
            from vllm_trianglemix_tpu.models.registry import resolve_model
            from vllm_trianglemix_tpu.usage import report_usage

            _, _model_cfg = resolve_model(engine_config.model.model)
            report_usage(
                type(_model_cfg).__name__, "LLM_ENGINE",
                {"dtype": engine_config.model.dtype,
                 "tensor_parallel_size":
                     engine_config.parallel.tensor_parallel_size,
                 "num_hosts": engine_config.parallel.num_hosts,
                 "multiprocess_engine": engine_config.multiprocess_engine})
        except Exception:  # noqa: BLE001 - telemetry is best-effort
            pass

        self.stat_loggers: list = []
        if engine_config.observability.collect_stats:
            from vllm_trianglemix_tpu.metrics.loggers import (
                LoggingStatLogger,
            )

            self.stat_loggers.append(LoggingStatLogger(
                engine_config.observability.log_stats_interval_s))
        if engine_config.observability.otlp_traces_endpoint:
            from vllm_trianglemix_tpu.tracing import TracingStatLogger

            self.stat_loggers.append(TracingStatLogger(
                engine_config.model.model,
                engine_config.observability.otlp_traces_endpoint))

    @classmethod
    def from_engine_config(cls, engine_config: EngineConfig) -> "LLMEngine":
        return cls(engine_config)

    def add_request(
        self,
        request_id: str,
        prompt: Union[str, list[int], dict],
        params: SamplingParams,
        priority: int = 0,
        lora_name: Optional[str] = None,
        pooling_params=None,
    ) -> None:
        request = self.processor.process_inputs(request_id, prompt, params,
                                                priority=priority,
                                                lora_name=lora_name,
                                                pooling_params=pooling_params)
        self.output_processor.add_request(request)
        self.engine_core.add_request(request)

    def abort_request(self, request_ids: list[str]) -> None:
        self.engine_core.abort_requests(request_ids)
        self.output_processor.abort_requests(request_ids)

    def step(self) -> list[RequestOutput]:
        return self._finish_step(self.engine_core.step())

    async def step_async(self) -> list[RequestOutput]:
        """One engine step for async callers. With a multiprocess core
        the output socket is awaited on the event loop (no worker
        thread — reference AsyncMPClient role); the in-process core's
        blocking device step runs in the default executor."""
        if hasattr(self.engine_core, "step_async"):
            return self._finish_step(await self.engine_core.step_async())
        import asyncio

        return await asyncio.get_running_loop().run_in_executor(
            None, self.step)

    def _finish_step(self, core_outputs) -> list[RequestOutput]:
        iteration_stats = (IterationStats() if self.stat_loggers else None)
        processed = self.output_processor.process_outputs(core_outputs,
                                                          iteration_stats)
        if processed.reqs_to_abort:
            self.engine_core.abort_requests(processed.reqs_to_abort)
            # Emit final outputs for stop-string-aborted requests now.
        if self.stat_loggers:
            scheduler_stats = self.engine_core.make_stats()
            for stat_logger in self.stat_loggers:
                stat_logger.record(scheduler_stats, iteration_stats)
        return processed.request_outputs

    def has_unfinished_requests(self) -> bool:
        return (self.engine_core.has_unfinished_requests()
                or self.output_processor.get_num_unfinished() > 0)

    def warm_up(self) -> None:
        self.engine_core.warm_up()

    def save_state(self, path: str) -> None:
        """Persist weights for fast resume (reference core.py:401
        save_sharded_state)."""
        if hasattr(self.engine_core, "executor"):
            self.engine_core.executor.save_state(path)
        else:
            self.engine_core.save_state(path)  # MP engine client

    def reload_weights(self, path=None) -> None:
        if hasattr(self.engine_core, "executor"):
            self.engine_core.executor.reload_weights(path)
        else:
            self.engine_core.reload_weights(path)  # MP engine client

    def reset_prefix_cache(self) -> bool:
        """Drop the prefix-cache index (reference reset_prefix_cache)."""
        core = self.engine_core
        if hasattr(core, "scheduler"):
            return core.scheduler.kv_cache_manager.reset_prefix_cache()
        return core.reset_prefix_cache()  # MP engine client

    def sleep(self, level: int = 1) -> None:
        """Release device memory for RLHF colocation (reference sleep
        mode, api_server.py:1001 + cumem allocator role). The engine
        must be idle; the prefix cache is flushed because the KV pool is
        dropped."""
        if self.has_unfinished_requests():
            raise ValueError("cannot sleep with unfinished requests")
        self.reset_prefix_cache()
        if hasattr(self.engine_core, "executor"):
            self.engine_core.executor.sleep(level)
        else:
            self.engine_core.sleep(level)  # MP engine client

    def wake_up(self) -> None:
        if hasattr(self.engine_core, "executor"):
            self.engine_core.executor.wake_up()
        else:
            self.engine_core.wake_up()  # MP engine client

    def is_sleeping(self) -> bool:
        if hasattr(self.engine_core, "executor"):
            return self.engine_core.executor.is_sleeping()
        return self.engine_core.is_sleeping()  # MP engine client

    def load_lora_adapter(self, name: str, path: str) -> None:
        """Runtime adapter registration (reference /v1/load_lora_adapter,
        api_server.py:1217)."""
        if hasattr(self.engine_core, "executor"):
            self.engine_core.executor.load_lora_adapter(name, path)
        else:
            self.engine_core.load_lora_adapter(name, path)

    def unload_lora_adapter(self, name: str) -> None:
        if hasattr(self.engine_core, "executor"):
            self.engine_core.executor.unload_lora_adapter(name)
        else:
            self.engine_core.unload_lora_adapter(name)

    def shutdown(self) -> None:
        if hasattr(self.engine_core, "shutdown"):
            self.engine_core.shutdown()

    def start_profile(self, trace_dir: Optional[str] = None) -> None:
        """jax.profiler trace capture (reference start_profile plumbing,
        llm_engine.py:294-298; TPU profiler server tpu_worker.py:93-104)."""
        import os
        import tempfile

        trace_dir = trace_dir or os.environ.get(
            "VTT_PROFILER_DIR", os.path.join(tempfile.gettempdir(),
                                             "vtt_traces"))
        if hasattr(self.engine_core, "executor"):
            self.engine_core.executor.profile_start(trace_dir)
        else:
            self.engine_core.profile_start(trace_dir)  # MP engine client

    def stop_profile(self) -> None:
        if hasattr(self.engine_core, "executor"):
            self.engine_core.executor.profile_stop()
        else:
            self.engine_core.profile_stop()  # MP engine client
