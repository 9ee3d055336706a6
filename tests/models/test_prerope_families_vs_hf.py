"""Numerics parity vs HuggingFace torch for the pre-rope-era / parallel-
block families: GPT-2, OPT, GPT-NeoX, Phi, StableLM, Cohere, Nemotron,
GLM, Falcon.

These exercise the decoder's learned-position / partial-rotary /
interleaved-rope / parallel-block knobs. Same strategy as
test_model_families_vs_hf.py: seeded random HF model, token-level logit
comparison through our paged forward.
"""

import json

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")

from tests.models.test_model_families_vs_hf import run_prefill  # noqa: E402
from vllm_trianglemix_tpu.models.weights import torch_state_dict_reader  # noqa: E402

COMMON = dict(
    vocab_size=512,
    hidden_size=64,
    num_hidden_layers=2,
    num_attention_heads=4,
    eos_token_id=3,
    bos_token_id=2,
)


def check(module, cfg, hf, seq=33, atol=3e-4, seed=0):
    params = module.params_from_hf_state_dict(
        cfg, torch_state_dict_reader(hf.state_dict()), dtype=jnp.float32)
    rng = np.random.default_rng(seed)
    token_ids = rng.integers(0, cfg.vocab_size, size=seq).tolist()
    with torch.no_grad():
        hf_logits = hf(torch.tensor([token_ids])).logits[0].numpy()
    ours = run_prefill(module, cfg, params, token_ids)
    np.testing.assert_allclose(ours, hf_logits, atol=atol, rtol=2e-3)


def test_gpt2_prefill_matches_hf():
    from transformers import GPT2Config as HFCfg
    from transformers import GPT2LMHeadModel

    from vllm_trianglemix_tpu.models import gpt2

    hf_kw = dict(vocab_size=512, n_embd=64, n_layer=2, n_head=4,
                 n_positions=128, n_inner=None,
                 activation_function="gelu_new",
                 bos_token_id=2, eos_token_id=3)
    torch.manual_seed(0)
    hf = GPT2LMHeadModel(HFCfg(**hf_kw)).eval().float()
    cfg = gpt2.Gpt2Config.from_hf_config(hf_kw)
    assert not cfg.use_rope and cfg.learned_pos_embeddings
    assert cfg.intermediate_size == 256 and not cfg.gated_mlp
    check(gpt2, cfg, hf)


def test_opt_prefill_matches_hf():
    from transformers import OPTConfig as HFCfg
    from transformers import OPTForCausalLM

    from vllm_trianglemix_tpu.models import opt

    hf_kw = dict(COMMON, ffn_dim=128, max_position_embeddings=128,
                 do_layer_norm_before=True, enable_bias=True,
                 activation_function="relu", word_embed_proj_dim=64,
                 tie_word_embeddings=True, pad_token_id=1)
    torch.manual_seed(1)
    hf = OPTForCausalLM(HFCfg(**hf_kw)).eval().float()
    cfg = opt.OPTConfig.from_hf_config(hf_kw)
    assert cfg.pos_embedding_offset == 2 and cfg.hidden_act == "relu"
    # HF stores the 2 pad rows inside the table
    assert hf.model.decoder.embed_positions.weight.shape[0] == 130
    check(opt, cfg, hf)


def test_gpt_neox_prefill_matches_hf():
    from transformers import GPTNeoXConfig as HFCfg
    from transformers import GPTNeoXForCausalLM

    from vllm_trianglemix_tpu.models import gpt_neox

    hf_kw = dict(COMMON, intermediate_size=128, rotary_pct=0.25,
                 rotary_emb_base=10_000, use_parallel_residual=True,
                 hidden_act="gelu", layer_norm_eps=1e-5,
                 max_position_embeddings=128, tie_word_embeddings=False)
    torch.manual_seed(2)
    hf = GPTNeoXForCausalLM(HFCfg(**hf_kw)).eval().float()
    cfg = gpt_neox.GptNeoXConfig.from_hf_config(hf_kw)
    assert cfg.parallel_block and not cfg.parallel_block_shared_norm
    assert cfg.partial_rotary_factor == 0.25
    check(gpt_neox, cfg, hf)


def test_gpt_neox_sequential_residual_matches_hf():
    from transformers import GPTNeoXConfig as HFCfg
    from transformers import GPTNeoXForCausalLM

    from vllm_trianglemix_tpu.models import gpt_neox

    hf_kw = dict(COMMON, intermediate_size=128, rotary_pct=0.5,
                 use_parallel_residual=False, hidden_act="gelu",
                 max_position_embeddings=128, tie_word_embeddings=False)
    torch.manual_seed(3)
    hf = GPTNeoXForCausalLM(HFCfg(**hf_kw)).eval().float()
    cfg = gpt_neox.GptNeoXConfig.from_hf_config(hf_kw)
    assert not cfg.parallel_block
    check(gpt_neox, cfg, hf)


def test_phi_prefill_matches_hf():
    from transformers import PhiConfig as HFCfg
    from transformers import PhiForCausalLM

    from vllm_trianglemix_tpu.models import phi

    hf_kw = dict(COMMON, intermediate_size=128, num_key_value_heads=4,
                 partial_rotary_factor=0.5, rope_theta=10_000.0,
                 hidden_act="gelu_new", layer_norm_eps=1e-5,
                 max_position_embeddings=128, tie_word_embeddings=False)
    torch.manual_seed(4)
    hf = PhiForCausalLM(HFCfg(**hf_kw)).eval().float()
    assert any("lm_head.bias" in k for k in hf.state_dict())
    cfg = phi.PhiConfig.from_hf_config(hf_kw)
    assert cfg.parallel_block and cfg.parallel_block_shared_norm
    assert cfg.lm_head_bias
    check(phi, cfg, hf)


def test_stablelm_prefill_matches_hf():
    from transformers import StableLmConfig as HFCfg
    from transformers import StableLmForCausalLM

    from vllm_trianglemix_tpu.models import stablelm

    hf_kw = dict(COMMON, intermediate_size=128, num_key_value_heads=2,
                 partial_rotary_factor=0.25, rope_theta=10_000.0,
                 use_qkv_bias=True, layer_norm_eps=1e-5,
                 max_position_embeddings=128, tie_word_embeddings=False,
                 use_parallel_residual=False, qk_layernorm=False)
    torch.manual_seed(5)
    hf = StableLmForCausalLM(HFCfg(**hf_kw)).eval().float()
    cfg = stablelm.StableLmConfig.from_hf_config(hf_kw)
    assert cfg.norm_type == "layernorm" and cfg.use_qkv_bias
    check(stablelm, cfg, hf)


def test_cohere_prefill_matches_hf():
    from transformers import CohereConfig as HFCfg
    from transformers import CohereForCausalLM

    from vllm_trianglemix_tpu.models import cohere

    hf_kw = dict(COMMON, intermediate_size=128, num_key_value_heads=2,
                 rope_theta=10_000.0, logit_scale=0.125,
                 layer_norm_eps=1e-5, max_position_embeddings=128,
                 use_qk_norm=False, tie_word_embeddings=True)
    torch.manual_seed(6)
    hf = CohereForCausalLM(HFCfg(**hf_kw)).eval().float()
    cfg = cohere.CohereConfig.from_hf_config(hf_kw)
    assert cfg.rope_interleaved and not cfg.norm_bias
    assert cfg.logits_scaling == pytest.approx(8.0)
    check(cohere, cfg, hf)


def test_nemotron_prefill_matches_hf():
    from transformers import NemotronConfig as HFCfg
    from transformers import NemotronForCausalLM

    from vllm_trianglemix_tpu.models import nemotron

    hf_kw = dict(COMMON, intermediate_size=128, num_key_value_heads=2,
                 partial_rotary_factor=0.5, rope_theta=10_000.0,
                 norm_eps=1e-5, max_position_embeddings=128,
                 tie_word_embeddings=False)
    torch.manual_seed(7)
    hf = NemotronForCausalLM(HFCfg(**hf_kw)).eval().float()
    cfg = nemotron.NemotronConfig.from_hf_config(hf_kw)
    assert cfg.norm_type == "layernorm1p" and cfg.hidden_act == "relu2"
    check(nemotron, cfg, hf)


def test_glm_prefill_matches_hf():
    from transformers import GlmConfig as HFCfg
    from transformers import GlmForCausalLM

    from vllm_trianglemix_tpu.models import glm

    hf_kw = dict(COMMON, intermediate_size=128, num_key_value_heads=2,
                 partial_rotary_factor=0.5, rope_theta=10_000.0,
                 attention_bias=True, head_dim=16,
                 max_position_embeddings=128, tie_word_embeddings=False,
                 pad_token_id=0)
    torch.manual_seed(8)
    hf = GlmForCausalLM(HFCfg(**hf_kw)).eval().float()
    assert any("gate_up_proj" in k for k in hf.state_dict())
    cfg = glm.GlmConfig.from_hf_config(hf_kw)
    assert cfg.rope_interleaved and cfg.partial_rotary_factor == 0.5
    check(glm, cfg, hf)


def test_falcon_mq_prefill_matches_hf():
    from transformers import FalconConfig as HFCfg
    from transformers import FalconForCausalLM

    from vllm_trianglemix_tpu.models import falcon

    # falcon-7b shape: multi_query, parallel_attn, single shared norm
    hf_kw = dict(vocab_size=512, hidden_size=64, num_hidden_layers=2,
                 num_attention_heads=4, multi_query=True,
                 new_decoder_architecture=False, parallel_attn=True,
                 bias=False, alibi=False, rope_theta=10_000.0,
                 max_position_embeddings=128, tie_word_embeddings=True,
                 eos_token_id=3, bos_token_id=2)
    torch.manual_seed(9)
    hf = FalconForCausalLM(HFCfg(**hf_kw)).eval().float()
    cfg = falcon.FalconConfig.from_hf_config(hf_kw)
    assert cfg.num_key_value_heads == 1 and cfg.parallel_block_shared_norm
    check(falcon, cfg, hf)


def test_falcon_new_arch_prefill_matches_hf():
    from transformers import FalconConfig as HFCfg
    from transformers import FalconForCausalLM

    from vllm_trianglemix_tpu.models import falcon

    # falcon-40b shape: grouped KV fused rows, ln_attn + ln_mlp
    hf_kw = dict(vocab_size=512, hidden_size=64, num_hidden_layers=2,
                 num_attention_heads=4, num_kv_heads=2, multi_query=False,
                 new_decoder_architecture=True, parallel_attn=True,
                 bias=False, alibi=False, rope_theta=10_000.0,
                 max_position_embeddings=128, tie_word_embeddings=True,
                 eos_token_id=3, bos_token_id=2)
    torch.manual_seed(10)
    hf = FalconForCausalLM(HFCfg(**hf_kw)).eval().float()
    cfg = falcon.FalconConfig.from_hf_config(hf_kw)
    assert cfg.num_key_value_heads == 2
    assert not cfg.parallel_block_shared_norm
    check(falcon, cfg, hf)


def test_new_families_registered():
    from vllm_trianglemix_tpu.models.registry import resolve_architecture

    for arch in ("GPT2LMHeadModel", "OPTForCausalLM",
                 "GPTNeoXForCausalLM", "PhiForCausalLM",
                 "StableLmForCausalLM", "CohereForCausalLM",
                 "NemotronForCausalLM", "GlmForCausalLM",
                 "FalconForCausalLM"):
        module, cfg_cls = resolve_architecture(arch)
        assert hasattr(module, "forward")
        assert hasattr(module, "kv_cache_spec")


def test_gptj_prefill_matches_hf():
    from transformers import GPTJConfig as HFCfg
    from transformers import GPTJForCausalLM

    from vllm_trianglemix_tpu.models import gptj

    hf_kw = dict(vocab_size=512, n_embd=64, n_layer=2, n_head=4,
                 n_positions=128, rotary_dim=8,
                 activation_function="gelu_new",
                 bos_token_id=2, eos_token_id=3, tie_word_embeddings=False)
    torch.manual_seed(11)
    hf = GPTJForCausalLM(HFCfg(**hf_kw)).eval().float()
    assert any("lm_head.bias" in k for k in hf.state_dict())
    cfg = gptj.GptJConfig.from_hf_config(hf_kw)
    assert cfg.rope_interleaved and cfg.parallel_block_shared_norm
    assert cfg.partial_rotary_factor == pytest.approx(0.5)  # 8 of 16
    check(gptj, cfg, hf)


def test_gpt_bigcode_prefill_matches_hf():
    from transformers import GPTBigCodeConfig as HFCfg
    from transformers import GPTBigCodeForCausalLM

    from vllm_trianglemix_tpu.models import gpt_bigcode

    hf_kw = dict(vocab_size=512, n_embd=64, n_layer=2, n_head=4,
                 n_positions=128, multi_query=True,
                 activation_function="gelu_pytorch_tanh",
                 bos_token_id=2, eos_token_id=3)
    torch.manual_seed(12)
    hf = GPTBigCodeForCausalLM(HFCfg(**hf_kw)).eval().float()
    cfg = gpt_bigcode.GptBigCodeConfig.from_hf_config(hf_kw)
    assert cfg.num_key_value_heads == 1 and cfg.learned_pos_embeddings
    check(gpt_bigcode, cfg, hf)


def test_olmo_prefill_matches_hf():
    from transformers import OlmoConfig as HFCfg
    from transformers import OlmoForCausalLM

    from vllm_trianglemix_tpu.models import olmo

    hf_kw = dict(COMMON, intermediate_size=128, num_key_value_heads=2,
                 rope_theta=10_000.0, clip_qkv=0.4, attention_bias=False,
                 max_position_embeddings=128, tie_word_embeddings=False)
    torch.manual_seed(13)
    hf = OlmoForCausalLM(HFCfg(**hf_kw)).eval().float()
    # non-parametric norms: no norm tensors in the checkpoint
    assert not any("layernorm" in k for k in hf.state_dict())
    cfg = olmo.OlmoConfig.from_hf_config(hf_kw)
    assert cfg.qkv_clip == pytest.approx(0.4) and not cfg.norm_bias
    check(olmo, cfg, hf)


def test_smollm3_nope_prefill_matches_hf():
    from transformers import SmolLM3Config as HFCfg
    from transformers import SmolLM3ForCausalLM

    from vllm_trianglemix_tpu.models import smollm3

    hf_kw = dict(COMMON, intermediate_size=128, num_key_value_heads=2,
                 rope_theta=10_000.0, no_rope_layer_interval=2,
                 max_position_embeddings=128, tie_word_embeddings=True,
                 attention_bias=False, mlp_bias=False, pad_token_id=0)
    torch.manual_seed(14)
    hf = SmolLM3ForCausalLM(HFCfg(**hf_kw)).eval().float()
    cfg = smollm3.SmolLM3Config.from_hf_config(
        json.loads(hf.config.to_json_string()))
    # every 2nd layer is NoPE at interval 2 with 2 layers
    assert cfg.rope_layers == (1, 0)
    check(smollm3, cfg, hf)
