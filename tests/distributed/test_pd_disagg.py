"""P/D disaggregation that moves bytes (VERDICT r3 missing #6 / next #10).

Engine A ("prefill", p2p producer) computes KV and serves the filled
blocks over ZMQ; engine B ("decode", p2p consumer) admits the same
request, discovers the prefix remotely, pulls the pages instead of
recomputing, and continues decoding. Outputs must be token-identical to
a single-engine run (reference: nixl/p2p connectors,
kv_transfer/kv_connector/v1/nixl_connector.py role).
"""

import socket

import pytest

from vllm_trianglemix_tpu.entrypoints.llm import LLM
from vllm_trianglemix_tpu.sampling_params import SamplingParams


def free_port() -> int:
    return socket.create_server(("127.0.0.1", 0)).getsockname()[1]


def make_llm(tiny_model_dir, connector=None):
    return LLM(model=tiny_model_dir, dtype="float32", max_model_len=128,
               max_num_seqs=4, max_num_batched_tokens=64, num_kv_blocks=48,
               kv_connector=connector)


@pytest.mark.timeout(300)
def test_prefill_engine_feeds_decode_engine(tiny_model_dir):
    addr = f"tcp://127.0.0.1:{free_port()}"
    prompt = list(range(40, 88))  # 48 tokens = 3 full blocks
    params = SamplingParams(max_tokens=6, temperature=0.0, ignore_eos=True)

    # Baseline: plain single engine, no connector.
    ref = make_llm(tiny_model_dir).generate(
        [prompt], params)[0].outputs[0].token_ids

    # Prefill engine: producer. max_tokens=1 — its job is the prefill.
    llm_p = make_llm(tiny_model_dir,
                     {"type": "p2p", "role": "producer", "address": addr})
    llm_p.generate([prompt],
                   SamplingParams(max_tokens=1, temperature=0.0,
                                  ignore_eos=True))
    runner_p = llm_p.llm_engine.engine_core.executor.worker.model_runner
    assert runner_p.kv_connector.stats_saved >= 3

    # Decode engine: consumer — pulls the prefix over ZMQ.
    llm_d = make_llm(tiny_model_dir,
                     {"type": "p2p", "role": "consumer", "address": addr})
    out = llm_d.generate([prompt], params)[0].outputs[0].token_ids
    assert out == ref

    # External hits cap at num_tokens-1 (>=1 token must compute to
    # produce logits), so the final block recomputes locally: 2 of the 3
    # full blocks arrive over the wire.
    runner_d = llm_d.llm_engine.engine_core.executor.worker.model_runner
    assert runner_d.kv_connector.stats_loaded >= 2
    runner_p.kv_connector.close()


@pytest.mark.timeout(300)
def test_consumer_degrades_to_recompute_without_producer(tiny_model_dir):
    """A dead/absent producer must not wedge the decode engine — it
    recomputes locally and still answers correctly."""
    addr = f"tcp://127.0.0.1:{free_port()}"   # nobody listening
    prompt = list(range(10, 50))
    params = SamplingParams(max_tokens=4, temperature=0.0, ignore_eos=True)
    ref = make_llm(tiny_model_dir).generate(
        [prompt], params)[0].outputs[0].token_ids
    llm_d = make_llm(tiny_model_dir,
                     {"type": "p2p", "role": "consumer", "address": addr,
                      "timeout_ms": 200})
    out = llm_d.generate([prompt], params)[0].outputs[0].token_ids
    assert out == ref
