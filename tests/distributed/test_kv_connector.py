"""KV connector: cross-engine prefix reuse through shared storage."""

import numpy as np

from vllm_trianglemix_tpu.entrypoints.llm import LLM
from vllm_trianglemix_tpu.sampling_params import SamplingParams


def make_llm(tiny_model_dir, store):
    return LLM(model=tiny_model_dir, dtype="float32", max_model_len=128,
               max_num_seqs=4, max_num_batched_tokens=64, num_kv_blocks=48,
               kv_connector={"type": "shared_storage", "path": store})


def test_cross_engine_prefix_reuse(tiny_model_dir, tmp_path):
    store = str(tmp_path / "kvstore")
    prompt = list(range(40, 80))  # 40 tokens = 2.5 blocks
    params = SamplingParams(max_tokens=5, temperature=0.0, ignore_eos=True)

    # Engine A computes and pushes blocks to the store (the worker-side
    # connector instance does the actual writes).
    llm_a = make_llm(tiny_model_dir, store)
    ref = llm_a.generate([prompt], params)[0].outputs[0].token_ids
    runner_a = llm_a.llm_engine.engine_core.executor.worker.model_runner
    import os

    assert runner_a.kv_connector.stats_saved >= 2
    assert len(os.listdir(store)) >= 2

    # Engine B (fresh process state, empty local prefix cache) pulls the
    # prefix from the store instead of recomputing it.
    llm_b = make_llm(tiny_model_dir, store)
    out_b = llm_b.generate([prompt], params)[0].outputs[0].token_ids
    assert out_b == ref

    runner_b = llm_b.llm_engine.engine_core.executor.worker.model_runner
    assert runner_b.kv_connector.stats_loaded >= 2
    # external hit counted as cached tokens
    req_cached = None
    # (request is freed; verify through connector stats + equality instead)


def test_connector_partial_block_tail_recomputed(tiny_model_dir, tmp_path):
    store = str(tmp_path / "kvstore2")
    prompt = list(range(10, 45))  # 35 tokens: 2 full blocks + tail
    params = SamplingParams(max_tokens=3, temperature=0.0, ignore_eos=True)
    a = make_llm(tiny_model_dir, store).generate([prompt], params)[0]
    llm_b = make_llm(tiny_model_dir, store)
    b = llm_b.generate([prompt], params)[0]
    assert a.outputs[0].token_ids == b.outputs[0].token_ids


def test_connector_disabled_by_default(tiny_llm):
    sched = tiny_llm.llm_engine.engine_core.scheduler
    assert sched.kv_connector is None


def test_cpu_offload_connector_lru():
    from vllm_trianglemix_tpu.distributed.kv_connector import (
        CPUOffloadConnector,
        create_connector,
    )

    c = create_connector({"type": "cpu_offload", "max_bytes": 3000})
    assert isinstance(c, CPUOffloadConnector)
    blk = np.ones((2, 4, 4, 8), np.float32)  # 1024 bytes
    c.save_block("a", blk)
    c.save_block("b", blk)
    c.save_block("c", blk)          # within budget: 3072 > 3000 -> evict a
    assert c.stats_evicted == 1 and not c.exists("a")
    assert c.load_block("b") is not None  # touch b -> LRU order (c, b)
    c.save_block("d", blk)
    assert not c.exists("c") and c.exists("b") and c.exists("d")


def test_cpu_offload_cross_engine_reuse(tiny_model_dir):
    # Engine A fills the host tier; engine B (fresh local prefix cache,
    # same process => same host store) pulls the prefix from it.
    mb = 123 << 20  # distinct budget => distinct memoized store
    kv_cfg = {"type": "cpu_offload", "max_bytes": mb}

    def make():
        return LLM(model=tiny_model_dir, dtype="float32", max_model_len=128,
                   max_num_seqs=4, max_num_batched_tokens=64,
                   num_kv_blocks=48, kv_connector=kv_cfg)

    params = SamplingParams(max_tokens=4, temperature=0.0, ignore_eos=True)
    prompt = list(range(40, 80))
    llm_a = make()
    a = llm_a.generate([prompt], params)[0].outputs[0].token_ids
    runner_a = llm_a.llm_engine.engine_core.executor.worker.model_runner
    assert runner_a.kv_connector.stats_saved >= 2

    llm_b = make()
    b = llm_b.generate([prompt], params)[0].outputs[0].token_ids
    assert a == b
    runner_b = llm_b.llm_engine.engine_core.executor.worker.model_runner
    assert runner_b.kv_connector is runner_a.kv_connector  # shared tier
    assert runner_b.kv_connector.stats_loaded >= 2
