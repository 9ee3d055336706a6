"""Engine-level multi-device regression (VERDICT round-1 item 6).

Runs the REAL LLMEngine/ModelRunner — not a toy step — on the virtual
8-CPU-device platform (conftest sets xla_force_host_platform_device_count)
with a tp=2 / tp=2,dp=2 mesh, and asserts token-identical greedy outputs
vs the single-device engine. Catches sharding bugs in the runner's mesh
path (worker/model_runner.py mesh branches) that the kernel-level dryrun
cannot. Reference analogue: tpu_distributed_utils.py:20-148 SPMD helpers
+ compare_two_settings (tests/utils.py:523).
"""

import jax
import numpy as np
import pytest

from vllm_trianglemix_tpu.entrypoints.llm import LLM
from vllm_trianglemix_tpu.sampling_params import SamplingParams

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 4, reason="needs >=4 virtual devices")


def run_engine(tiny_model_dir, tp, prompts):
    llm = LLM(model=tiny_model_dir, dtype="float32", max_model_len=128,
              block_size=16, max_num_seqs=4, max_num_batched_tokens=128,
              num_kv_blocks=32, skip_tokenizer_init=True,
              tensor_parallel_size=tp, multiprocess_engine=False)
    worker = llm.llm_engine.engine_core.executor.worker
    if tp > 1:
        assert worker.mesh is not None and worker.mesh.size == tp
        kv_sharding = worker.model_runner.kv_caches.sharding
        assert kv_sharding.spec[3] == "tp", kv_sharding  # kv-head axis
    outs = llm.generate(prompts, SamplingParams(
        temperature=0.0, max_tokens=8, ignore_eos=True))
    return [list(o.outputs[0].token_ids) for o in outs]


def test_tp2_engine_matches_single_device(tiny_model_dir):
    rng = np.random.default_rng(0)
    prompts = [rng.integers(1, 400, size=n).tolist()
               for n in (7, 19, 33, 5)]
    base = run_engine(tiny_model_dir, tp=1, prompts=prompts)
    tp2 = run_engine(tiny_model_dir, tp=2, prompts=prompts)
    assert base == tp2


def test_cp2_engine_matches_single_device(tiny_model_dir):
    """DCP engine wiring (parallel/dcp.py:dcp_write_and_attention): KV
    pages sharded over a cp=2 mesh axis, write+attention+LSE merge under
    shard_map — greedy outputs must be token-identical to single-device.
    Reference analogue: decode_context_parallel_size + merge_attn_states
    (sched/scheduler.py:105, tests/distributed/test_context_parallel.py).
    """
    rng = np.random.default_rng(1)
    prompts = [rng.integers(1, 400, size=n).tolist()
               for n in (9, 23, 41, 6)]
    base = run_engine(tiny_model_dir, tp=1, prompts=prompts)

    llm = LLM(model=tiny_model_dir, dtype="float32", max_model_len=128,
              block_size=16, max_num_seqs=4, max_num_batched_tokens=128,
              num_kv_blocks=32, skip_tokenizer_init=True,
              context_parallel_size=2, multiprocess_engine=False)
    worker = llm.llm_engine.engine_core.executor.worker
    assert worker.mesh is not None and "cp" in worker.mesh.axis_names
    kv_sharding = worker.model_runner.kv_caches.sharding
    assert kv_sharding.spec[1] == "cp", kv_sharding  # page axis
    outs = llm.generate(prompts, SamplingParams(
        temperature=0.0, max_tokens=8, ignore_eos=True))
    cp2 = [list(o.outputs[0].token_ids) for o in outs]
    assert base == cp2
