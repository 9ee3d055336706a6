"""DeepSeek-V2 (MLA + shared-expert MoE) numerics parity vs HuggingFace.

Pins the absorbed-latent attention (attention/mla.py) to HF's explicit
per-head K/V computation (transformers modeling_deepseek_v2.py) — weight
absorption is algebraically exact, so logits must match to float32
tolerance. Covers: interleaved rope, kv_a/kv_b latent path, dense first
layer + MoE (greedy and group-limited-greedy routing, shared experts,
routed_scaling_factor), and decode over the latent paged cache.
"""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
from transformers import DeepseekV2Config as HFDeepseekV2Config  # noqa: E402
from transformers import DeepseekV2ForCausalLM  # noqa: E402

from vllm_trianglemix_tpu.config import TriangleMixConfig  # noqa: E402
from vllm_trianglemix_tpu.models import deepseek_v2  # noqa: E402
from vllm_trianglemix_tpu.models.weights import torch_state_dict_reader  # noqa: E402
from tests.models.test_qwen3_vs_hf import single_seq_metadata  # noqa: E402

BASE = dict(
    vocab_size=256,
    hidden_size=64,
    intermediate_size=128,
    moe_intermediate_size=32,
    num_hidden_layers=3,
    num_attention_heads=4,
    num_key_value_heads=4,
    kv_lora_rank=32,
    q_lora_rank=None,
    qk_nope_head_dim=16,
    qk_rope_head_dim=8,
    v_head_dim=16,
    n_routed_experts=8,
    n_shared_experts=1,
    num_experts_per_tok=2,
    first_k_dense_replace=1,
    moe_layer_freq=1,
    routed_scaling_factor=1.5,
    rms_norm_eps=1e-6,
    rope_theta=10000.0,
    max_position_embeddings=512,
    tie_word_embeddings=False,
)


def build(hf_kw, seed=0):
    torch.manual_seed(seed)
    hf = DeepseekV2ForCausalLM(HFDeepseekV2Config(**hf_kw)).eval().float()
    cfg = deepseek_v2.DeepseekV2Config.from_hf_config(hf_kw)
    params = deepseek_v2.params_from_hf_state_dict(
        cfg, torch_state_dict_reader(hf.state_dict()), dtype=jnp.float32)
    return hf, cfg, params


def prefill_logits(cfg, params, token_ids, block_size=8):
    seq_len = len(token_ids)
    num_blocks = -(-seq_len // block_size) + 2
    kv = jnp.zeros((cfg.num_hidden_layers,
                    *deepseek_v2.kv_cache_layer_shape(cfg, num_blocks,
                                                      block_size)),
                   jnp.float32)
    md = single_seq_metadata(seq_len, block_size, num_blocks)
    tri = jnp.zeros(cfg.num_hidden_layers, bool)
    hidden, kv = deepseek_v2.forward(
        params, cfg, TriangleMixConfig(),
        jnp.asarray(token_ids, jnp.int32), kv, md, tri)
    return np.asarray(deepseek_v2.compute_logits(params, cfg, hidden)), kv


def test_deepseek_v2_prefill_matches_hf():
    hf, cfg, params = build(BASE)
    rng = np.random.default_rng(0)
    token_ids = rng.integers(0, BASE["vocab_size"], size=33).tolist()
    with torch.no_grad():
        hf_logits = hf(torch.tensor([token_ids])).logits[0].numpy()
    ours, _ = prefill_logits(cfg, params, token_ids)
    np.testing.assert_allclose(ours, hf_logits, atol=3e-4, rtol=3e-3)


def test_deepseek_v2_q_lora_and_group_limited():
    hf_kw = dict(BASE, q_lora_rank=24, topk_method="group_limited_greedy",
                 n_group=4, topk_group=2, num_experts_per_tok=2)
    hf, cfg, params = build(hf_kw, seed=1)
    assert cfg.q_lora_rank == 24
    rng = np.random.default_rng(1)
    token_ids = rng.integers(0, BASE["vocab_size"], size=21).tolist()
    with torch.no_grad():
        hf_logits = hf(torch.tensor([token_ids])).logits[0].numpy()
    ours, _ = prefill_logits(cfg, params, token_ids)
    np.testing.assert_allclose(ours, hf_logits, atol=3e-4, rtol=3e-3)


def test_deepseek_v2_decode_matches_hf():
    """Greedy decode over the latent paged cache == HF full re-forward."""
    hf, cfg, params = build(BASE, seed=2)
    rng = np.random.default_rng(2)
    prompt = rng.integers(0, BASE["vocab_size"], size=11).tolist()
    block_size = 8
    num_blocks = 8
    kv = jnp.zeros((cfg.num_hidden_layers,
                    *deepseek_v2.kv_cache_layer_shape(cfg, num_blocks,
                                                      block_size)),
                   jnp.float32)
    md = single_seq_metadata(len(prompt), block_size, num_blocks)
    tri = jnp.zeros(cfg.num_hidden_layers, bool)
    hidden, kv = deepseek_v2.forward(
        params, cfg, TriangleMixConfig(),
        jnp.asarray(prompt, jnp.int32), kv, md, tri)
    logits = deepseek_v2.compute_logits(params, cfg, hidden)
    seq = list(prompt)
    tok = int(np.argmax(np.asarray(logits)[-1]))
    for _ in range(6):
        seq.append(tok)
        pos = len(seq) - 1
        md1 = single_seq_metadata(len(seq), block_size, num_blocks,
                                  start=pos)
        hidden, kv = deepseek_v2.forward(
            params, cfg, TriangleMixConfig(),
            jnp.asarray([tok], jnp.int32), kv, md1, tri)
        logits = deepseek_v2.compute_logits(params, cfg, hidden)
        tok = int(np.argmax(np.asarray(logits)[-1]))

    hf.generation_config.eos_token_id = None  # never stop early
    with torch.no_grad():
        ref = hf.generate(torch.tensor([prompt]), do_sample=False,
                          max_new_tokens=7)[0, len(prompt):].tolist()
    assert seq[len(prompt):] + [tok] == ref


def test_deepseek_v2_engine_e2e(tmp_path):
    """Full engine path (runner MLA hooks: latent cache alloc, warmup,
    paged decode) vs HF greedy generate."""
    import json

    from safetensors.torch import save_file

    from vllm_trianglemix_tpu.entrypoints.llm import LLM
    from vllm_trianglemix_tpu.sampling_params import SamplingParams

    hf, cfg, _ = build(BASE, seed=3)
    d = tmp_path / "dsv2"
    d.mkdir()
    hf_cfg = json.loads(hf.config.to_json_string())
    hf_cfg["architectures"] = ["DeepseekV2ForCausalLM"]
    with open(d / "config.json", "w") as f:
        json.dump(hf_cfg, f)
    save_file({k: v.contiguous() for k, v in hf.state_dict().items()},
              str(d / "model.safetensors"))

    llm = LLM(model=str(d), dtype="float32", max_model_len=128,
              max_num_seqs=2, max_num_batched_tokens=64, num_kv_blocks=32,
              skip_tokenizer_init=True)
    rng = np.random.default_rng(3)
    prompts = [rng.integers(1, BASE["vocab_size"], size=n).tolist()
               for n in (9, 5)]
    params = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True)
    outs = [o.outputs[0].token_ids for o in llm.generate(prompts, params)]

    hf.generation_config.eos_token_id = None
    for prompt, got in zip(prompts, outs):
        with torch.no_grad():
            ref = hf.generate(torch.tensor([prompt]), do_sample=False,
                              max_new_tokens=8)[0, len(prompt):].tolist()
        assert got == ref


def test_deepseek_v3_routing_matches_hf():
    """V3's sigmoid + aux-loss-free (noaux_tc) routing with the
    e_score_correction_bias, through the same MLA backbone."""
    from transformers import DeepseekV3Config as HFV3Config
    from transformers import DeepseekV3ForCausalLM

    hf_kw = dict(BASE, n_routed_experts=8, n_group=4, topk_group=2,
                 num_experts_per_tok=2, norm_topk_prob=True,
                 q_lora_rank=24, kv_lora_rank=32, routed_scaling_factor=2.5)
    torch.manual_seed(4)
    hf = DeepseekV3ForCausalLM(HFV3Config(**hf_kw)).eval().float()
    # give the correction bias real values (zeros-init by default)
    with torch.no_grad():
        for layer in hf.model.layers[1:]:
            layer.mlp.gate.e_score_correction_bias.uniform_(-0.5, 0.5)

    cfg = deepseek_v2.DeepseekV3Config.from_hf_config(hf_kw)
    assert cfg.scoring_func == "sigmoid"
    assert cfg.topk_method == "noaux_tc"
    params = deepseek_v2.params_from_hf_state_dict(
        cfg, torch_state_dict_reader(hf.state_dict()), dtype=jnp.float32)

    rng = np.random.default_rng(4)
    token_ids = rng.integers(0, BASE["vocab_size"], size=19).tolist()
    with torch.no_grad():
        hf_logits = hf(torch.tensor([token_ids])).logits[0].numpy()
    ours, _ = prefill_logits(cfg, params, token_ids)
    np.testing.assert_allclose(ours, hf_logits, atol=3e-4, rtol=3e-3)
