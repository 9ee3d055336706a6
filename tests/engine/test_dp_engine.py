"""Data-parallel engine replica pool (engine/dp_coordinator.py).

Two engine-core subprocesses behind the least-loaded router must
produce the same greedy outputs as a single in-process engine, spread
requests across replicas, and route aborts to the owning replica.
"""

import numpy as np
import pytest

from vllm_trianglemix_tpu.config import (
    CacheConfig,
    EngineConfig,
    ModelConfig,
    ParallelConfig,
    SchedulerConfig,
)
from vllm_trianglemix_tpu.sampling_params import SamplingParams


def make_config(tiny_model_dir, dp_size):
    return EngineConfig(
        multiprocess_engine=dp_size > 1,
        model=ModelConfig(model=tiny_model_dir, dtype="float32",
                          max_model_len=128),
        cache=CacheConfig(block_size=16, num_gpu_blocks=48),
        scheduler=SchedulerConfig(max_num_seqs=4,
                                  max_num_batched_tokens=64),
        parallel=ParallelConfig(data_parallel_size=dp_size),
    )


@pytest.mark.timeout(900)
def test_dp_pool_matches_single_engine(tiny_model_dir):
    from vllm_trianglemix_tpu.engine.llm_engine import LLMEngine

    params = SamplingParams(max_tokens=5, temperature=0.0, ignore_eos=True)
    rng = np.random.default_rng(1)
    prompts = [rng.integers(1, 400, size=n).tolist() for n in (5, 8, 6, 9)]

    def run(dp_size):
        eng = LLMEngine.from_engine_config(
            make_config(tiny_model_dir, dp_size))
        outs = {}
        try:
            if dp_size > 1:
                from vllm_trianglemix_tpu.engine.dp_coordinator import (
                    DPEngineClient,
                )

                assert isinstance(eng.engine_core, DPEngineClient)
            for i, p in enumerate(prompts):
                eng.add_request(str(i), p, params)
            if dp_size > 1:
                # least-loaded routing spreads 4 requests over 2 replicas
                assert eng.engine_core.replica_loads() == [2, 2]
            while eng.has_unfinished_requests():
                for o in eng.step():
                    if o.finished:
                        outs[o.request_id] = o.outputs[0].token_ids
        finally:
            eng.shutdown()
        return [outs[str(i)] for i in range(len(prompts))]

    assert run(2) == run(1)


@pytest.mark.timeout(900)
def test_dp_abort_routes_to_owner(tiny_model_dir):
    from vllm_trianglemix_tpu.engine.llm_engine import LLMEngine

    eng = LLMEngine.from_engine_config(make_config(tiny_model_dir, 2))
    try:
        params = SamplingParams(max_tokens=50, temperature=0.0,
                                ignore_eos=True)
        eng.add_request("a", [5, 6, 7], params)
        eng.add_request("b", [8, 9, 10], params)
        assert eng.engine_core.replica_loads() == [1, 1]
        eng.abort_request(["a"])
        assert eng.engine_core.replica_loads() == [0, 1]
        done = None
        while eng.has_unfinished_requests():
            for o in eng.step():
                if o.finished:
                    done = o.request_id
        assert done == "b"
    finally:
        eng.shutdown()
