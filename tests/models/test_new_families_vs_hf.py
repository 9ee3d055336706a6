"""Numerics parity for the round-4 model families vs HuggingFace torch:
Gemma-1 (GeGLU + (1+w) norm + scaled embeddings), Phi-3 (fused
qkv/gate_up checkpoints), Qwen2-MoE (shared expert + sigmoid gate),
Granite (scalar multipliers).

Same strategy as test_model_families_vs_hf.py: seeded random HF model,
token-level logit comparison through our paged forward.
"""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")

from tests.models.test_model_families_vs_hf import run_prefill  # noqa: E402
from vllm_trianglemix_tpu.models.weights import torch_state_dict_reader  # noqa: E402

COMMON = dict(
    vocab_size=512,
    hidden_size=64,
    intermediate_size=128,
    num_hidden_layers=2,
    num_attention_heads=4,
    num_key_value_heads=2,
    max_position_embeddings=512,
    rms_norm_eps=1e-6,
    eos_token_id=3,
    bos_token_id=2,
)


def check(module, cfg, hf, seq=37, atol=3e-4, seed=0):
    params = module.params_from_hf_state_dict(
        cfg, torch_state_dict_reader(hf.state_dict()), dtype=jnp.float32)
    rng = np.random.default_rng(seed)
    token_ids = rng.integers(0, cfg.vocab_size, size=seq).tolist()
    with torch.no_grad():
        hf_logits = hf(torch.tensor([token_ids])).logits[0].numpy()
    ours = run_prefill(module, cfg, params, token_ids)
    np.testing.assert_allclose(ours, hf_logits, atol=atol, rtol=2e-3)


def test_gemma_prefill_matches_hf():
    from transformers import GemmaConfig as HFCfg
    from transformers import GemmaForCausalLM

    from vllm_trianglemix_tpu.models import gemma

    hf_kw = dict(COMMON, head_dim=16, rope_theta=10_000.0,
                 hidden_act="gelu_pytorch_tanh",
                 hidden_activation="gelu_pytorch_tanh",
                 tie_word_embeddings=True)
    torch.manual_seed(0)
    hf = GemmaForCausalLM(HFCfg(**hf_kw)).eval().float()
    cfg = gemma.GemmaConfig.from_hf_config(hf_kw)
    assert cfg.gemma_norm and cfg.hidden_act == "gelu_tanh"
    assert cfg.embedding_multiplier == pytest.approx(8.0)  # sqrt(64)
    check(gemma, cfg, hf)


def test_phi3_prefill_matches_hf():
    from transformers import Phi3Config as HFCfg
    from transformers import Phi3ForCausalLM

    from vllm_trianglemix_tpu.models import phi3

    hf_kw = dict(COMMON, rope_theta=10_000.0, tie_word_embeddings=False,
                 pad_token_id=0)
    torch.manual_seed(1)
    hf = Phi3ForCausalLM(HFCfg(**hf_kw)).eval().float()
    # checkpoint really is fused
    assert any("qkv_proj" in k for k in hf.state_dict())
    assert any("gate_up_proj" in k for k in hf.state_dict())
    cfg = phi3.Phi3Config.from_hf_config(hf_kw)
    check(phi3, cfg, hf)


def test_qwen2_moe_prefill_matches_hf():
    from transformers import Qwen2MoeConfig as HFCfg
    from transformers import Qwen2MoeForCausalLM

    from vllm_trianglemix_tpu.models import qwen2_moe

    hf_kw = dict(COMMON, rope_theta=1_000_000.0,
                 num_experts=4, num_experts_per_tok=2,
                 moe_intermediate_size=96,
                 shared_expert_intermediate_size=80,
                 norm_topk_prob=False, decoder_sparse_step=1,
                 mlp_only_layers=[], tie_word_embeddings=False,
                 use_sliding_window=False)
    torch.manual_seed(2)
    hf = Qwen2MoeForCausalLM(HFCfg(**hf_kw)).eval().float()
    cfg = qwen2_moe.Qwen2MoeConfig.from_hf_config(hf_kw)
    assert cfg.use_qkv_bias and cfg.shared_expert_intermediate_size == 80
    assert cfg.use_shared_expert_gate and not cfg.norm_topk_prob
    check(qwen2_moe, cfg, hf)


def test_granite_prefill_matches_hf():
    from transformers import GraniteConfig as HFCfg
    from transformers import GraniteForCausalLM

    from vllm_trianglemix_tpu.models import granite

    hf_kw = dict(COMMON, rope_theta=10_000.0, tie_word_embeddings=True,
                 embedding_multiplier=12.0, residual_multiplier=0.22,
                 attention_multiplier=0.0156, logits_scaling=8.0,
                 attention_bias=False)
    torch.manual_seed(3)
    hf = GraniteForCausalLM(HFCfg(**hf_kw)).eval().float()
    cfg = granite.GraniteConfig.from_hf_config(hf_kw)
    assert cfg.residual_multiplier == pytest.approx(0.22)
    assert cfg.logits_scaling == 8.0
    check(granite, cfg, hf)


def test_new_families_registered():
    from vllm_trianglemix_tpu.models.registry import resolve_architecture

    for arch in ("GemmaForCausalLM", "Phi3ForCausalLM",
                 "Qwen2MoeForCausalLM", "GraniteForCausalLM"):
        module, cfg_cls = resolve_architecture(arch)
        assert hasattr(module, "forward") and hasattr(module,
                                                      "kv_cache_spec")


def test_starcoder2_prefill_matches_hf():
    from transformers import Starcoder2Config as HFCfg
    from transformers import Starcoder2ForCausalLM

    from vllm_trianglemix_tpu.models import starcoder2

    hf_kw = dict(COMMON, rope_theta=100_000.0, use_bias=True,
                 hidden_act="gelu_pytorch_tanh", norm_epsilon=1e-5,
                 tie_word_embeddings=True, sliding_window=None)
    torch.manual_seed(4)
    hf = Starcoder2ForCausalLM(HFCfg(**hf_kw)).eval().float()
    cfg = starcoder2.Starcoder2Config.from_hf_config(hf_kw)
    assert cfg.norm_type == "layernorm" and not cfg.gated_mlp
    assert cfg.use_o_bias and cfg.use_mlp_bias
    check(starcoder2, cfg, hf)


def test_olmo2_prefill_matches_hf():
    from transformers import Olmo2Config as HFCfg
    from transformers import Olmo2ForCausalLM

    from vllm_trianglemix_tpu.models import olmo2

    hf_kw = dict(COMMON, rope_theta=500_000.0, tie_word_embeddings=False)
    torch.manual_seed(5)
    hf = Olmo2ForCausalLM(HFCfg(**hf_kw)).eval().float()
    cfg = olmo2.Olmo2Config.from_hf_config(hf_kw)
    assert cfg.postnorm and cfg.qk_norm_flat
    check(olmo2, cfg, hf)
