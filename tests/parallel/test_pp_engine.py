"""Pipeline-parallel engine regression (parallel/pp.py).

Runs the REAL LLMEngine/ModelRunner with layers sharded in stages over a
pp=2 mesh on the virtual 8-CPU-device platform, and asserts
token-identical greedy outputs vs the single-device engine. Reference
analogue: PP layer-range partitioning + IntermediateTensors send/recv
(vllm/distributed/parallel_state.py `_PP`, models/utils.py
PPMissingLayer) exercised via compare_two_settings (tests/utils.py:523).
"""

import jax
import numpy as np
import pytest

from vllm_trianglemix_tpu.entrypoints.llm import LLM
from vllm_trianglemix_tpu.sampling_params import SamplingParams

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 2, reason="needs >=2 virtual devices")


def run_engine(tiny_model_dir, pp, prompts):
    llm = LLM(model=tiny_model_dir, dtype="float32", max_model_len=128,
              block_size=16, max_num_seqs=4, max_num_batched_tokens=128,
              num_kv_blocks=32, skip_tokenizer_init=True,
              pipeline_parallel_size=pp, multiprocess_engine=False)
    worker = llm.llm_engine.engine_core.executor.worker
    if pp > 1:
        assert worker.mesh is not None and worker.mesh.shape["pp"] == pp
        kv_sharding = worker.model_runner.kv_caches.sharding
        assert kv_sharding.spec[0] == "pp", kv_sharding  # layer axis
        # stage-sharded weights: each layer-stacked leaf splits axis 0
        w = worker.model_runner.params["layers"]["q_proj"]
        assert w.sharding.spec[0] == "pp", w.sharding
    outs = llm.generate(prompts, SamplingParams(
        temperature=0.0, max_tokens=8, ignore_eos=True))
    return [list(o.outputs[0].token_ids) for o in outs]


def test_pp2_engine_matches_single_device(tiny_model_dir):
    rng = np.random.default_rng(2)
    prompts = [rng.integers(1, 400, size=n).tolist()
               for n in (7, 19, 33, 5)]
    base = run_engine(tiny_model_dir, pp=1, prompts=prompts)
    pp2 = run_engine(tiny_model_dir, pp=2, prompts=prompts)
    assert base == pp2


def run_engine_tp(tiny_model_dir, pp, tp, prompts):
    llm = LLM(model=tiny_model_dir, dtype="float32", max_model_len=128,
              block_size=16, max_num_seqs=4, max_num_batched_tokens=128,
              num_kv_blocks=32, skip_tokenizer_init=True,
              pipeline_parallel_size=pp, tensor_parallel_size=tp,
              multiprocess_engine=False)
    outs = llm.generate(prompts, SamplingParams(
        temperature=0.0, max_tokens=8, ignore_eos=True))
    return [list(o.outputs[0].token_ids) for o in outs]


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs >=4 devices")
def test_pp2_tp2_engine_matches_single_device(tiny_model_dir):
    """pp x tp composition (VERDICT r3 next #9): manual pp collectives
    via shard_map axis_names, tp left to the auto SPMD partitioner."""
    rng = np.random.default_rng(3)
    prompts = [rng.integers(1, 400, size=n).tolist() for n in (9, 21, 4)]
    base = run_engine_tp(tiny_model_dir, pp=1, tp=1, prompts=prompts)
    pp_tp = run_engine_tp(tiny_model_dir, pp=2, tp=2, prompts=prompts)
    assert base == pp_tp


def test_pp_microbatches_active(tiny_model_dir):
    """The microbatched pipeline path (M = pp stacked metadata slices)
    is what actually runs for bucketed batches."""
    llm = LLM(model=tiny_model_dir, dtype="float32", max_model_len=128,
              block_size=16, max_num_seqs=4, max_num_batched_tokens=128,
              num_kv_blocks=32, skip_tokenizer_init=True,
              pipeline_parallel_size=2, multiprocess_engine=False)
    runner = llm.llm_engine.engine_core.executor.worker.model_runner
    mb = runner._build_pp_mb(
        np.zeros(16, np.int32), np.zeros(16, np.int32),
        np.full(16, -1, np.int32), np.arange(5, dtype=np.int32) * 4,
        16, 4)
    assert mb is not None and mb["positions"].shape == (2, 8)
    # query_start_loc re-clipped per microbatch
    assert mb["query_start_loc"].shape == (2, 5)
    assert int(mb["query_start_loc"][1][0]) == 0
