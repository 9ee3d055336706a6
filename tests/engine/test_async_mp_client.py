"""Async MP engine-core client: AsyncLLM awaits the ZMQ output socket
on the event loop instead of thread-wrapping a blocking step (reference
AsyncMPClient role, vllm/v1/engine/core_client.py).

Checks that the MP-backed AsyncLLM streams token-identical results to
the in-process engine for concurrent requests, and that the await path
(EngineCoreClient.step_async) is what actually runs.
"""

import asyncio

import numpy as np
import pytest

from vllm_trianglemix_tpu.config import (
    CacheConfig,
    EngineConfig,
    ModelConfig,
    SchedulerConfig,
)
from vllm_trianglemix_tpu.sampling_params import SamplingParams


def make_config(tiny_model_dir, multiprocess):
    return EngineConfig(
        multiprocess_engine=multiprocess,
        model=ModelConfig(model=tiny_model_dir, dtype="float32",
                          max_model_len=128),
        cache=CacheConfig(block_size=16, num_gpu_blocks=48),
        scheduler=SchedulerConfig(max_num_seqs=4,
                                  max_num_batched_tokens=64),
    )


@pytest.mark.timeout(600)
def test_async_llm_over_mp_core(tiny_model_dir):
    from vllm_trianglemix_tpu.engine.async_llm import AsyncLLM
    from vllm_trianglemix_tpu.engine.core_proc import EngineCoreClient

    params = SamplingParams(max_tokens=6, temperature=0.0,
                            ignore_eos=True)
    rng = np.random.default_rng(1)
    prompts = [rng.integers(1, 400, size=n).tolist() for n in (5, 9, 3)]

    async def run(multiprocess):
        engine = AsyncLLM.from_engine_config(
            make_config(tiny_model_dir, multiprocess))
        calls = {"n": 0}
        core = engine.engine.engine_core
        if multiprocess:
            assert isinstance(core, EngineCoreClient)
            orig = core.step_async

            async def counting():
                calls["n"] += 1
                return await orig()

            core.step_async = counting
        try:
            outs = await asyncio.gather(*[
                engine.generate_once(p, params, f"r{i}")
                for i, p in enumerate(prompts)
            ])
            toks = [list(o.outputs[0].token_ids) for o in outs]
        finally:
            engine.shutdown()
            if hasattr(core, "shutdown"):
                core.shutdown()
        if multiprocess:
            # the await path drove the loop (not the executor fallback)
            assert calls["n"] > 0
        return toks

    got_mp = asyncio.run(run(True))
    got_inproc = asyncio.run(run(False))
    assert got_mp == got_inproc
