"""Data-parallel engine scale-out: replica pool + least-loaded routing.

Role of the reference's DPCoordinator / data-parallel engine replicas
(vllm/v1/engine/coordinator.py, core_client.py DPAsyncMPClient): run N
independent engine cores — each with its own scheduler and device
slice — behind one frontend, route new requests to the least-loaded
replica, and merge their output streams. TPU-native framing: one
replica per host/slice partition; within a replica, parallelism is the
SPMD mesh (tp/dp axes), so this layer only load-balances whole
requests and never splits a batch.

The client below is interface-compatible with EngineCore /
EngineCoreClient (add_request, abort_requests, step, ...), so
LLMEngine/AsyncLLM work unchanged on top of it.
"""

from __future__ import annotations

from collections import defaultdict

from vllm_trianglemix_tpu.config import EngineConfig
from vllm_trianglemix_tpu.engine.core_proc import EngineCoreClient
from vllm_trianglemix_tpu.logger import init_logger

logger = init_logger(__name__)


class DPEngineClient:
    """N background engine replicas with least-loaded request routing."""

    def __init__(self, engine_config: EngineConfig,
                 dp_size: int | None = None) -> None:
        import dataclasses

        dp_size = dp_size or engine_config.parallel.data_parallel_size
        assert dp_size >= 1
        # Each replica is a complete engine over its own device slice:
        # its internal mesh must not try to span the replica axis.
        replica_config = dataclasses.replace(
            engine_config,
            parallel=dataclasses.replace(engine_config.parallel,
                                         data_parallel_size=1))
        self.clients = [EngineCoreClient(replica_config)
                        for _ in range(dp_size)]
        # Frontends size prompt validation off the smallest replica.
        self.num_kv_blocks = min(c.num_kv_blocks for c in self.clients)
        self._routes: dict[str, int] = {}
        logger.info("data-parallel engine pool ready (%d replicas)",
                    dp_size)

    # --- engine-core-compatible surface ------------------------------------
    def add_request(self, request) -> None:
        idx = min(range(len(self.clients)),
                  key=lambda i: self.clients[i].num_unfinished())
        self._routes[request.request_id] = idx
        self.clients[idx].add_request(request)

    def abort_requests(self, request_ids: list[str]) -> None:
        by_replica: dict[int, list[str]] = defaultdict(list)
        for rid in request_ids:
            idx = self._routes.pop(rid, None)
            if idx is not None:
                by_replica[idx].append(rid)
        for idx, rids in by_replica.items():
            self.clients[idx].abort_requests(rids)

    def step(self):
        """Collect the next batch of outputs from any busy replica."""
        outputs = []
        while not outputs:
            busy = [c for c in self.clients if c.has_unfinished_requests()]
            if not busy:
                break
            for c in busy:
                outputs.extend(c.try_step(timeout_ms=20))
        for out in outputs:
            if out.finished:
                self._routes.pop(out.request_id, None)
        return outputs

    def has_unfinished_requests(self) -> bool:
        return any(c.has_unfinished_requests() for c in self.clients)

    def make_stats(self):
        return self.clients[0].make_stats()

    def warm_up(self) -> None:
        for c in self.clients:
            c.warm_up()

    def save_state(self, path: str) -> None:
        self.clients[0].save_state(path)

    def reset_prefix_cache(self) -> bool:
        return all([c.reset_prefix_cache() for c in self.clients])

    def profile_start(self, trace_dir: str) -> None:
        self.clients[0].profile_start(trace_dir)

    def profile_stop(self) -> None:
        self.clients[0].profile_stop()

    def reload_weights(self, path=None) -> None:
        for c in self.clients:
            c.reload_weights(path)

    def shutdown(self) -> None:
        for c in self.clients:
            c.shutdown()

    # --- introspection ------------------------------------------------------
    def replica_loads(self) -> list[int]:
        return [c.num_unfinished() for c in self.clients]
