"""Star-chain TREE speculative decoding (reference eagle.py tree
proposals + tree_attn.py verification role):

1. Losslessness: greedy outputs are token-identical to non-speculative
   decoding with ANY draft (tree verification + the host acceptance
   walk never change emitted tokens).
2. Acceptance beats linear chains: sibling candidates rescue steps where
   the draft's top-1 missed but a top-b alternative matched — unit-level
   via the walk, end-to-end via emitted-tokens-per-spec-step.
3. EAGLE-3 loader: multi-layer feature taps (k*D fusion fc + midlayer
   layout + d2t draft-vocab map) load and serve losslessly.
"""

import json

import numpy as np
import pytest

from vllm_trianglemix_tpu.entrypoints.llm import LLM
from vllm_trianglemix_tpu.sampling_params import SamplingParams

TREE = {"method": "eagle", "tree_branching": (2, 2)}
CHAIN = {"method": "eagle", "num_speculative_tokens": 2}


@pytest.fixture(scope="module")
def one_layer_model_dir(tmp_path_factory):
    """1-layer random Qwen3-style checkpoint (the perfect-draft trick of
    test_eagle_spec needs depth 1)."""
    import torch
    from safetensors.torch import save_file
    from transformers import Qwen3Config, Qwen3ForCausalLM

    d = tmp_path_factory.mktemp("one_layer_tree")
    hf = Qwen3ForCausalLM(Qwen3Config(
        vocab_size=300, hidden_size=64, intermediate_size=128,
        num_hidden_layers=1, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, max_position_embeddings=512, rope_theta=1e6,
        tie_word_embeddings=True)).eval().float()
    cfg = json.loads(hf.config.to_json_string())
    cfg["architectures"] = ["Qwen3ForCausalLM"]
    with open(d / "config.json", "w") as f:
        json.dump(cfg, f)
    save_file({k: v.contiguous() for k, v in hf.state_dict().items()
               if k != "lm_head.weight"},
              str(d / "model.safetensors"))
    return str(d)


def make_llm(model_dir, spec=None):
    return LLM(model=model_dir, dtype="float32", max_model_len=128,
               max_num_seqs=4, max_num_batched_tokens=64, num_kv_blocks=48,
               skip_tokenizer_init=True, speculative_config=spec)


def gen(llm, prompts, **kw):
    params = SamplingParams(temperature=0.0, ignore_eos=True, **kw)
    return [o.outputs[0].token_ids for o in llm.generate(prompts, params)]


def test_tree_lossless_with_random_draft(tiny_model_dir):
    base = make_llm(tiny_model_dir)
    tree = make_llm(tiny_model_dir, TREE)
    rng = np.random.default_rng(0)
    prompts = [rng.integers(1, 400, size=n).tolist() for n in (6, 11, 4)]
    assert gen(base, prompts, max_tokens=12) == \
        gen(tree, prompts, max_tokens=12)
    stats = tree.llm_engine.engine_core.scheduler.spec_stats
    assert stats["num_drafts"] > 0


def test_tree_lossless_perfect_draft(one_layer_model_dir):
    from tests.engine.test_eagle_spec import (
        perfect_draft_params,
        runner_of,
    )

    base = make_llm(one_layer_model_dir)
    tree = make_llm(one_layer_model_dir, TREE)
    runner = runner_of(tree)
    runner.eagle_params = perfect_draft_params(runner)

    rng = np.random.default_rng(1)
    prompts = [rng.integers(1, 280, size=n).tolist() for n in (8, 5, 12)]
    assert gen(base, prompts, max_tokens=24) == \
        gen(tree, prompts, max_tokens=24)
    stats = tree.llm_engine.engine_core.scheduler.spec_stats
    # perfect draft: the chain accepts fully nearly every step
    assert stats["num_accepted"] > 0


def test_tree_walk_sibling_rescue():
    """The host walk accepts a sibling (plus its bonus) where the linear
    chain would reject at the first token — acceptance strictly beats
    linear-K on the same logits."""
    from vllm_trianglemix_tpu.config import (
        EngineConfig,
        ModelConfig,
        SpeculativeConfig,
    )
    from vllm_trianglemix_tpu.worker.model_runner import ModelRunner

    class Stub:
        engine_config = EngineConfig(
            model=ModelConfig(model="x"),
            speculative=SpeculativeConfig(method="eagle",
                                          tree_branching=(2, 2)))
        _tree_walk = ModelRunner._tree_walk

    stub = Stub()
    # drafts (level-major): level1 = [10, 11]; level2 = [20, 21]
    drafts = [10, 11, 20, 21]
    # rows: [real, n(1,0), n(1,1), n(2,0), n(2,1)]
    # target picks 11 at level 1 -> sibling accept + bonus from its row
    out = stub._tree_walk(np.array([11, 99, 55, 99, 99]), drafts)
    assert out == [11, 55]
    # chain walk on the same tokens: draft 10 != 11 -> recovery only
    assert len(out) > 1
    # chain path: target 10 -> deeper: target 20 -> full accept + bonus
    out = stub._tree_walk(np.array([10, 20, 99, 77, 99]), drafts)
    assert out == [10, 20, 77]
    # miss at level 1 -> recovery token only
    out = stub._tree_walk(np.array([42, 1, 2, 3, 4]), drafts)
    assert out == [42]


def test_tree_acceptance_not_below_chain(one_layer_model_dir):
    """Same noisy draft, same workload: emitted tokens per spec step
    with the tree must be >= the linear chain (siblings only add)."""
    from tests.engine.test_eagle_spec import (
        perfect_draft_params,
        runner_of,
    )

    def noisy(runner, scale=0.6, seed=3):
        import jax
        import jax.numpy as jnp

        dp = perfect_draft_params(runner)
        key = jax.random.PRNGKey(seed)
        dp["fc"] = dp["fc"] + scale * jax.random.normal(
            key, dp["fc"].shape, dp["fc"].dtype) / dp["fc"].shape[0] ** 0.5
        return dp

    rng = np.random.default_rng(7)
    prompts = [rng.integers(1, 280, size=n).tolist() for n in (9, 6, 13)]

    def run(spec):
        llm = make_llm(one_layer_model_dir, spec)
        runner = runner_of(llm)
        runner.eagle_params = noisy(runner)
        gen(llm, prompts, max_tokens=24)
        st = llm.llm_engine.engine_core.scheduler.spec_stats
        n_per = (2 if spec is CHAIN else 4)
        steps = st["num_drafts"] / n_per
        return st["num_accepted"] / max(steps, 1)

    acc_chain = run(CHAIN)
    acc_tree = run(TREE)
    assert acc_tree >= acc_chain - 1e-9, (acc_tree, acc_chain)


def test_eagle3_loader_and_lossless(tiny_model_dir, tmp_path):
    """EAGLE-3-layout checkpoint (midlayer + k*D fusion fc + d2t) loads,
    taps wire through the target forward, and greedy stays lossless."""
    import torch
    from safetensors.torch import save_file

    from vllm_trianglemix_tpu.models.registry import resolve_model
    from vllm_trianglemix_tpu.spec_decode.eagle import (
        eagle_hidden_taps,
        load_eagle_params,
    )

    _, cfg = resolve_model(tiny_model_dir)
    D, HQ, KH, Dh = (cfg.hidden_size, cfg.num_attention_heads,
                     cfg.num_key_value_heads, cfg.head_dim)
    I, V = cfg.intermediate_size, cfg.vocab_size
    torch.manual_seed(0)
    Vd = V // 2  # reduced draft vocab
    d2t = torch.arange(Vd, dtype=torch.int64)  # draft i -> target i + d2t[i]
    sd = {
        "fc.weight": torch.randn(D, 2 * D) * 0.02,
        "midlayer.self_attn.q_proj.weight": torch.randn(HQ * Dh, 2 * D) * .02,
        "midlayer.self_attn.k_proj.weight": torch.randn(KH * Dh, 2 * D) * .02,
        "midlayer.self_attn.v_proj.weight": torch.randn(KH * Dh, 2 * D) * .02,
        "midlayer.self_attn.o_proj.weight": torch.randn(D, HQ * Dh) * 0.02,
        "midlayer.input_layernorm.weight": torch.ones(D),
        "midlayer.hidden_norm.weight": torch.ones(D),
        "midlayer.post_attention_layernorm.weight": torch.ones(D),
        "midlayer.mlp.gate_proj.weight": torch.randn(I, D) * 0.02,
        "midlayer.mlp.up_proj.weight": torch.randn(I, D) * 0.02,
        "midlayer.mlp.down_proj.weight": torch.randn(D, I) * 0.02,
        "norm.weight": torch.ones(D),
        "lm_head.weight": torch.randn(Vd, D) * 0.02,
        "d2t": d2t,
    }
    ddir = tmp_path / "eagle3"
    ddir.mkdir()
    save_file({k: v.contiguous() for k, v in sd.items()},
              str(ddir / "model.safetensors"))

    params = load_eagle_params(str(ddir))
    assert eagle_hidden_taps(params, D) == 2
    assert "d2t" in params and params["q_proj"].shape == (2 * D, HQ * Dh)

    base = make_llm(tiny_model_dir)
    spec = make_llm(tiny_model_dir,
                    {"method": "eagle", "model": str(ddir),
                     "num_speculative_tokens": 2})
    runner_spec = spec.llm_engine.engine_core.executor.worker.model_runner
    assert runner_spec._eagle_tap_layers is not None
    rng = np.random.default_rng(5)
    prompts = [rng.integers(1, 400, size=n).tolist() for n in (6, 10)]
    assert gen(base, prompts, max_tokens=10) == \
        gen(spec, prompts, max_tokens=10)
