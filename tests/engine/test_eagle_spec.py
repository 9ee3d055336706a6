"""EAGLE draft-model speculative decoding (spec_decode/eagle.py).

Two invariants, mirroring the reference EagleProposer's guarantees
(vllm/v1/spec_decode/eagle.py):

1. **Losslessness**: with ANY draft (even random weights), greedy outputs
   are token-identical to non-speculative decoding — rejection sampling
   makes draft quality a performance knob, never a correctness one.
2. **Acceptance machinery**: a draft constructed to reproduce the target
   exactly (possible when the target has ONE layer: fc selects the token
   embedding, the draft layer IS the target layer, heads are shared)
   must reach near-total acceptance, proving the catch-up KV bookkeeping
   and the on-device acceptance walk are consistent with the host walk.
"""

import json

import numpy as np
import pytest

from vllm_trianglemix_tpu.entrypoints.llm import LLM
from vllm_trianglemix_tpu.sampling_params import SamplingParams

K = 3
EAGLE = {"method": "eagle", "num_speculative_tokens": K}


@pytest.fixture(scope="module")
def one_layer_model_dir(tmp_path_factory):
    """1-layer random Qwen3-style checkpoint (perfect-draft trick needs
    depth 1)."""
    import torch
    from safetensors.torch import save_file
    from transformers import Qwen3Config, Qwen3ForCausalLM

    d = tmp_path_factory.mktemp("one_layer")
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
               if k != "lm_head.weight"},  # tied to embed_tokens
              str(d / "model.safetensors"))
    return str(d)


def make_llm(model_dir, spec=None):
    return LLM(model=model_dir, dtype="float32", max_model_len=128,
               max_num_seqs=4, max_num_batched_tokens=64, num_kv_blocks=48,
               skip_tokenizer_init=True, speculative_config=spec)


def runner_of(llm):
    return llm.llm_engine.engine_core.executor.worker.model_runner


def gen(llm, prompts, **kw):
    params = SamplingParams(temperature=0.0, ignore_eos=True, **kw)
    return [o.outputs[0].token_ids for o in llm.generate(prompts, params)]


def perfect_draft_params(runner):
    """fc = [I; 0] (take the embedding, drop the hidden), draft layer =
    target layer 0, heads shared — reproduces a 1-layer target exactly."""
    import jax.numpy as jnp

    t = runner.params
    D = runner.cfg.hidden_size
    fc = jnp.concatenate([jnp.eye(D, dtype=runner.dtype),
                          jnp.zeros((D, D), runner.dtype)], axis=0)
    dp = {"fc": fc}
    for key in ("input_layernorm", "q_proj", "k_proj", "v_proj", "o_proj",
                "post_attention_layernorm", "gate_proj", "up_proj",
                "down_proj", "q_norm", "k_norm"):
        if key in t["layers"]:
            dp[key] = t["layers"][key][0]
    return dp


def test_lossless_with_random_draft(tiny_model_dir):
    base = make_llm(tiny_model_dir)
    spec = make_llm(tiny_model_dir, EAGLE)
    rng = np.random.default_rng(0)
    prompts = [rng.integers(1, 400, size=n).tolist() for n in (6, 11, 4)]
    assert gen(base, prompts, max_tokens=12) == \
        gen(spec, prompts, max_tokens=12)
    # drafts were actually scheduled (the machinery ran)
    stats = spec.llm_engine.engine_core.scheduler.spec_stats
    assert stats["num_drafts"] > 0


def test_perfect_draft_high_acceptance(one_layer_model_dir):
    base = make_llm(one_layer_model_dir)
    spec = make_llm(one_layer_model_dir, EAGLE)
    runner = runner_of(spec)
    runner.eagle_params = perfect_draft_params(runner)

    rng = np.random.default_rng(1)
    prompts = [rng.integers(1, 280, size=n).tolist() for n in (8, 5, 12)]
    out_b = gen(base, prompts, max_tokens=24)
    out_s = gen(spec, prompts, max_tokens=24)
    assert out_b == out_s  # lossless regardless

    stats = spec.llm_engine.engine_core.scheduler.spec_stats
    assert stats["num_drafts"] > 0
    rate = stats["num_accepted"] / stats["num_drafts"]
    # The draft IS the target model here; acceptance must be ~1.
    assert rate > 0.9, f"acceptance {rate:.2f} ({stats})"


def test_eagle_with_sampling_seeds(tiny_model_dir):
    # temperature>0: rejection sampling path; just exercise it end to end
    # (distributional losslessness is covered by test_rejection_sampling).
    spec = make_llm(tiny_model_dir, EAGLE)
    params = SamplingParams(temperature=0.8, seed=7, max_tokens=10,
                            ignore_eos=True)
    outs = spec.generate([[3, 5, 7, 9]], params)
    assert len(outs[0].outputs[0].token_ids) == 10
