"""EPLB: placement balancing, weight-shuffle correctness, and the
permutation invariance of the EP MoE under a rebalanced placement
(reference vllm/distributed/eplb/{rebalance_algo,rebalance_execute}).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vllm_trianglemix_tpu.parallel.eplb import (
    EplbState,
    balanced_placement,
    inverse_permutation,
    shuffle_mapping,
)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 4, reason="needs >=4 virtual devices")


def test_balanced_placement_reduces_max_load():
    rng = np.random.default_rng(0)
    loads = rng.zipf(1.5, size=16).astype(np.float64)  # heavy skew
    ep = 4
    p = balanced_placement(loads, ep)
    assert sorted(p) == list(range(16))  # a permutation
    per = 16 // ep
    naive = loads.reshape(ep, per).sum(axis=1).max()
    packed = loads[p].reshape(ep, per).sum(axis=1).max()
    assert packed <= naive
    # With equal slot counts per shard, the heaviest shard is at worst
    # the heaviest expert plus the (per-1) lightest ones.
    assert packed <= loads.max() + np.sort(loads)[:per - 1].sum()


def test_shuffle_mapping_roundtrip():
    rng = np.random.default_rng(1)
    old = rng.permutation(8).astype(np.int32)
    new = rng.permutation(8).astype(np.int32)
    m = shuffle_mapping(old, new)
    # w stored under old placement: w_old[:, j] = logical[old[j]]
    logical = np.arange(8)
    w_old = logical[old]
    w_new = w_old[m]
    assert (w_new == logical[new]).all()
    assert (inverse_permutation(old)[old] == np.arange(8)).all()


def test_ep_moe_permutation_invariant():
    """ep_moe_mlp with a rebalanced placement (shuffled weights +
    eplb_map) must produce identical outputs."""
    from dataclasses import dataclass

    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from vllm_trianglemix_tpu.parallel.ep import ep_moe_mlp

    @dataclass(frozen=True)
    class Cfg:
        num_experts: int = 8
        num_experts_per_tok: int = 2
        norm_topk_prob: bool = True

    cfg = Cfg()
    mesh = Mesh(np.asarray(jax.devices()[:4]).reshape(1, 1, 4),
                ("dp", "cp", "tp"))
    rng = np.random.default_rng(2)
    T, D, F, E = 12, 16, 32, cfg.num_experts
    h = jnp.asarray(rng.standard_normal((T, D)), jnp.float32)

    def shard(x, spec):
        return jax.device_put(jnp.asarray(x, jnp.float32),
                              NamedSharding(mesh, spec))

    lp = {
        "moe_gate": shard(rng.standard_normal((D, E)), P(None, None)),
        "gate_proj": shard(rng.standard_normal((E, D, F)),
                           P("tp", None, None)),
        "up_proj": shard(rng.standard_normal((E, D, F)),
                         P("tp", None, None)),
        "down_proj": shard(rng.standard_normal((E, F, D)),
                           P("tp", None, None)),
    }
    base, counts = ep_moe_mlp(h, lp, cfg, mesh, return_counts=True)
    assert int(np.asarray(counts).sum()) == T * cfg.num_experts_per_tok

    # rebalance by the measured counts
    st = EplbState(E, ep=4, interval=1)
    st.accumulate(np.asarray(counts))
    assert st.step()
    res = st.rebalance()
    if res is None:  # already balanced: force an arbitrary permutation
        new_p = np.roll(np.arange(E, dtype=np.int32), 3)
        mapping = shuffle_mapping(np.arange(E, dtype=np.int32), new_p)
    else:
        new_p, mapping = res
    lp2 = dict(lp)
    for k in ("gate_proj", "up_proj", "down_proj"):
        lp2[k] = lp[k][mapping]
    lp2["eplb_map"] = jnp.asarray(inverse_permutation(new_p), jnp.int32)
    moved = ep_moe_mlp(h, lp2, cfg, mesh)
    np.testing.assert_allclose(np.asarray(moved), np.asarray(base),
                               rtol=1e-5, atol=1e-5)


def test_engine_with_eplb_stays_exact(tiny_model_dir):
    """Full engine with EPLB on a dense model is a no-op; with the MoE
    family it rebalances without changing greedy outputs."""
    import json
    import os

    from vllm_trianglemix_tpu.entrypoints.llm import LLM
    from vllm_trianglemix_tpu.sampling_params import SamplingParams

    # Build a tiny Qwen3-MoE checkpointless config dir (random weights,
    # fixed seed) — EP requires E % tp == 0.
    import tempfile

    d = tempfile.mkdtemp()
    cfg = {
        "architectures": ["Qwen3MoeForCausalLM"],
        "vocab_size": 128, "hidden_size": 32, "intermediate_size": 64,
        "moe_intermediate_size": 16, "num_hidden_layers": 2,
        "num_attention_heads": 4, "num_key_value_heads": 2,
        "head_dim": 8, "num_experts": 8, "num_experts_per_tok": 2,
        "norm_topk_prob": True, "max_position_embeddings": 128,
        "rope_theta": 1e6, "rms_norm_eps": 1e-6,
        "tie_word_embeddings": True,
    }
    with open(os.path.join(d, "config.json"), "w") as f:
        json.dump(cfg, f)

    def run(eplb):
        llm = LLM(model=d, dtype="float32", max_model_len=64,
                  max_num_seqs=2, max_num_batched_tokens=32,
                  num_kv_blocks=16, skip_tokenizer_init=True,
                  tensor_parallel_size=2, enable_expert_parallel=True,
                  enable_eplb=eplb, eplb_interval=2)
        prompts = [[3, 5, 7], [9, 11]]
        outs = llm.generate(prompts, SamplingParams(
            temperature=0.0, max_tokens=8, ignore_eos=True))
        runner = (llm.llm_engine.engine_core.executor.worker
                  .model_runner)
        return ([o.outputs[0].token_ids for o in outs],
                runner._eplb_state)

    base, _ = run(eplb=False)
    got, st = run(eplb=True)
    assert got == base  # rebalancing never changes outputs
    assert st is not None and st.counts.sum() >= 0
