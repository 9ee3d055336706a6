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
        spec = model_module.kv_cache_spec(
            model_cfg, engine_config.cache.block_size, dtype_bytes=2)
        kv_cache_config = KVCacheConfig(
            num_blocks=self.executor.num_kv_blocks,
            kv_cache_groups=(KVCacheGroupSpec(("all_layers",), spec),),
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

    def add_request(self, request: Request) -> None:
        self.structured_output_manager.maybe_add_request(request)
        if self.structured_output_manager.has_request(request.request_id):
            self.scheduler.no_lookahead_req_ids.add(request.request_id)
        self.scheduler.add_request(request)

    def abort_requests(self, request_ids: list[str]) -> None:
        self.scheduler.abort_requests(request_ids)
        for rid in request_ids:
            self.structured_output_manager.remove_request(rid)
            self.scheduler.no_lookahead_req_ids.discard(rid)

    def step(self) -> list[EngineCoreOutput]:
        """One engine iteration (reference core.py:272-291)."""
        if not self.scheduler.has_unfinished_requests():
            return []
        scheduler_output = self.scheduler.schedule()
        som = self.structured_output_manager
        if som.requests and scheduler_output.num_scheduled_tokens:
            req_ids = list(scheduler_output.num_scheduled_tokens.keys())
            scheduler_output.grammar_mask = som.grammar_mask(
                req_ids, len(req_ids))
        model_output = self.executor.execute_model(scheduler_output)
        outputs = self.scheduler.update_from_output(scheduler_output,
                                                    model_output)
        for out in outputs:
            som.accept_tokens(out.request_id, out.new_token_ids)
            if out.finished:
                som.remove_request(out.request_id)
                self.scheduler.no_lookahead_req_ids.discard(out.request_id)
        return outputs

    def has_unfinished_requests(self) -> bool:
        return self.scheduler.has_unfinished_requests()

    def make_stats(self) -> SchedulerStats:
        return self.scheduler.make_stats()

    def warm_up(self) -> None:
        self.executor.compile_or_warm_up_model()

    def shutdown(self) -> None:
        self.executor.shutdown()
