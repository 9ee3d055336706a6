"""EngineCore: one scheduler+executor step loop.

Mirror of the reference's EngineCore (vllm/v1/engine/core.py:272 step):
schedule → execute → update. KV-cache sizing happens at init by asking the
executor how many blocks fit (reference core.py:169 _initialize_kv_caches).
"""

from __future__ import annotations

from vllm_trianglemix_tpu.config import EngineConfig
from vllm_trianglemix_tpu.core.kv_cache_interface import (
    KVCacheConfig,
    KVCacheGroupSpec,
)
from vllm_trianglemix_tpu.core.sched_output import EngineCoreOutput, SchedulerStats
from vllm_trianglemix_tpu.core.scheduler import Scheduler
from vllm_trianglemix_tpu.executor.abstract import Executor
from vllm_trianglemix_tpu.logger import init_logger
from vllm_trianglemix_tpu.request import Request

logger = init_logger(__name__)


class EngineCore:

    def __init__(self, engine_config: EngineConfig) -> None:
        self.engine_config = engine_config

        executor_cls = Executor.get_class(engine_config)
        self.executor = executor_cls(engine_config)

        # KV cache geometry comes from the executor (worker probed HBM).
        from vllm_trianglemix_tpu.models.registry import resolve_model

        model_module, model_cfg = resolve_model(engine_config.model.model)
        if hasattr(model_module, "kv_cache_group_specs"):
            # Hybrid models (e.g. alternating sliding/full attention)
            # declare one group per cache type (reference
            # kv_cache_coordinator.py role).
            groups = tuple(model_module.kv_cache_group_specs(
                model_cfg, engine_config.cache.block_size, dtype_bytes=2))
        else:
            spec = model_module.kv_cache_spec(
                model_cfg, engine_config.cache.block_size, dtype_bytes=2)
            groups = (KVCacheGroupSpec(("all_layers",), spec),)
        kv_cache_config = KVCacheConfig(
            num_blocks=self.executor.num_kv_blocks,
            kv_cache_groups=groups,
        )
        from vllm_trianglemix_tpu.distributed.kv_connector import (
            create_connector,
        )

        self.scheduler = Scheduler(
            scheduler_config=engine_config.scheduler,
            cache_config=engine_config.cache,
            kv_cache_config=kv_cache_config,
            max_model_len=engine_config.model.max_model_len,
            speculative_config=engine_config.speculative,
            kv_connector=create_connector(engine_config.kv_connector),
        )

        # Structured-output manager (reference v1/structured_output role).
        from vllm_trianglemix_tpu.engine.processor import load_tokenizer
        from vllm_trianglemix_tpu.structured_output import (
            StructuredOutputManager,
        )

        import os

        tokenizer = None
        tok_path = engine_config.model.tokenizer
        if not engine_config.model.skip_tokenizer_init and tok_path \
                and os.path.isdir(tok_path):
            tokenizer = load_tokenizer(tok_path)
        self.structured_output_manager = StructuredOutputManager(
            tokenizer, model_cfg.vocab_size, model_cfg.eos_token_id)
        # The scheduler must not run device-side decode lookahead for
        # grammar-constrained requests (masks are host-side per step).
        self.scheduler.no_lookahead_req_ids = set()

        # Async scheduling (reference async_scheduler.py + AsyncLLM overlap):
        # at most one step in flight; step N+1's host work (schedule +
        # input assembly + dispatch) runs while step N executes on device.
        self.async_scheduling = self.scheduler.async_scheduling
        from collections import deque

        self._in_flight: deque = deque()
        self._drained_outputs: list[EngineCoreOutput] = []

    def add_request(self, request: Request) -> None:
        self.structured_output_manager.maybe_add_request(request)
        if self.structured_output_manager.has_request(request.request_id):
            self.scheduler.no_lookahead_req_ids.add(request.request_id)
        self.scheduler.add_request(request)

    def abort_requests(self, request_ids: list[str]) -> None:
        if self._in_flight:
            # Settle in-flight steps before mutating scheduler state; their
            # outputs are delivered with the next step's.
            self._drained_outputs += self._drain_in_flight()
        self.scheduler.abort_requests(request_ids)
        for rid in request_ids:
            self.structured_output_manager.remove_request(rid)
            self.scheduler.no_lookahead_req_ids.discard(rid)

    def step(self) -> list[EngineCoreOutput]:
        """One engine iteration (reference core.py:272-291). In async mode
        the new step is dispatched before the previous step's results are
        fetched, overlapping host scheduling with device compute."""
        if self.async_scheduling:
            return self._step_async()
        if not self.scheduler.has_unfinished_requests():
            return []
        return self._step_sync()

    def _step_sync(self) -> list[EngineCoreOutput]:
        scheduler_output = self.scheduler.schedule()
        som = self.structured_output_manager
        if som.requests and scheduler_output.num_scheduled_tokens:
            req_ids = list(scheduler_output.num_scheduled_tokens.keys())
            scheduler_output.grammar_mask = som.grammar_mask(
                req_ids, len(req_ids))
        model_output = self.executor.execute_model(scheduler_output)
        outputs = self.scheduler.update_from_output(scheduler_output,
                                                    model_output)
        self._postprocess_outputs(outputs)
        return outputs

    def _step_async(self) -> list[EngineCoreOutput]:
        outputs = self._drained_outputs
        self._drained_outputs = []
        # Grammar-constrained or host-logit-row requests need host token
        # state current at schedule time: drain the pipeline and run the
        # step synchronously.
        if self.structured_output_manager.requests or any(
                r.sampling_params is not None
                and r.sampling_params.needs_logit_rows
                for r in self.scheduler.requests.values()):
            outputs += self._drain_in_flight()
            if self.scheduler.has_unfinished_requests():
                outputs += self._step_sync()
            return outputs
        dispatched = False
        if self.scheduler.has_unfinished_requests():
            so = self.scheduler.schedule()
            # Dispatch even when empty: the worker must still see
            # finished_req_ids to evict them from its persistent batch.
            pending = self.executor.execute_model_async(so)
            self._in_flight.append((so, pending))
            dispatched = True
        # Keep the just-dispatched step in flight: its results are fetched
        # on the NEXT call, after that call has dispatched its successor —
        # that is the scheduling/compute overlap.
        if self._in_flight and (len(self._in_flight) > 1 or not dispatched):
            so, pending = self._in_flight.popleft()
            step_outputs = self.scheduler.update_from_output(
                so, pending.get())
            self._postprocess_outputs(step_outputs)
            outputs += step_outputs
        return outputs

    def _drain_in_flight(self) -> list[EngineCoreOutput]:
        outputs = []
        while self._in_flight:
            so, pending = self._in_flight.popleft()
            step_outputs = self.scheduler.update_from_output(
                so, pending.get())
            self._postprocess_outputs(step_outputs)
            outputs += step_outputs
        return outputs

    def _postprocess_outputs(self, outputs: list[EngineCoreOutput]) -> None:
        som = self.structured_output_manager
        for out in outputs:
            som.accept_tokens(out.request_id, out.new_token_ids)
            if out.finished:
                som.remove_request(out.request_id)
                self.scheduler.no_lookahead_req_ids.discard(out.request_id)

    def has_unfinished_requests(self) -> bool:
        return (self.scheduler.has_unfinished_requests()
                or bool(self._in_flight) or bool(self._drained_outputs))

    def make_stats(self) -> SchedulerStats:
        return self.scheduler.make_stats()

    def warm_up(self) -> None:
        self.executor.compile_or_warm_up_model()

    def shutdown(self) -> None:
        self.executor.shutdown()
