"""Background-process engine core (ZMQ) e2e vs in-process engine."""

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
def test_multiprocess_engine_matches_inproc(tiny_model_dir):
    from vllm_trianglemix_tpu.engine.llm_engine import LLMEngine

    params = SamplingParams(max_tokens=6, temperature=0.0, ignore_eos=True)
    rng = np.random.default_rng(0)
    prompts = [rng.integers(1, 400, size=n).tolist() for n in (5, 9)]

    def run(multiprocess):
        eng = LLMEngine.from_engine_config(
            make_config(tiny_model_dir, multiprocess))
        outs = {}
        try:
            for i, p in enumerate(prompts):
                eng.add_request(str(i), p, params)
            while eng.has_unfinished_requests():
                for o in eng.step():
                    if o.finished:
                        outs[o.request_id] = o.outputs[0].token_ids
        finally:
            eng.shutdown()
        return [outs[str(i)] for i in range(len(prompts))]

    assert run(True) == run(False)


@pytest.mark.timeout(600)
def test_multiprocess_engine_stream_and_stop(tiny_model_dir):
    from vllm_trianglemix_tpu.engine.llm_engine import LLMEngine

    eng = LLMEngine.from_engine_config(make_config(tiny_model_dir, True))
    try:
        free = None
        eng.add_request("probe", [7, 8, 9],
                        SamplingParams(max_tokens=6, temperature=0.0,
                                       ignore_eos=True))
        while eng.has_unfinished_requests():
            for o in eng.step():
                if o.finished:
                    free = o.outputs[0].token_ids
        stop_tok = free[1]
        eng.add_request("stopped", [7, 8, 9],
                        SamplingParams(max_tokens=6, temperature=0.0,
                                       ignore_eos=True,
                                       stop_token_ids=[stop_tok]))
        final = None
        while eng.has_unfinished_requests():
            for o in eng.step():
                if o.finished:
                    final = o
        assert final.outputs[0].token_ids[-1] == stop_tok
        assert len(final.outputs[0].token_ids) <= 2
    finally:
        eng.shutdown()
