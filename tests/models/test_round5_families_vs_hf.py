"""Numerics parity for the round-5 model families vs HuggingFace torch:
ERNIE 4.5, Seed-OSS (split qkv/o bias flags), Arcee (non-gated relu^2),
GLM-4 (sandwich norms + fused gate_up), Phi-3.5-MoE (sparsemixer
routing), GraniteMoe (fused expert stacks + multipliers), DBRX (fused
Wqkv + flat experts + clip_qkv).

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


def test_ernie45_prefill_matches_hf():
    from transformers import Ernie4_5Config as HFCfg
    from transformers import Ernie4_5ForCausalLM

    from vllm_trianglemix_tpu.models import ernie4_5

    hf_kw = dict(COMMON, head_dim=16, rope_theta=500_000.0,
                 use_bias=True, tie_word_embeddings=True,
                 rms_norm_eps=1e-5, pad_token_id=0)
    torch.manual_seed(0)
    hf = Ernie4_5ForCausalLM(HFCfg(**hf_kw)).eval().float()
    cfg = ernie4_5.Ernie45Config.from_hf_config(hf_kw)
    assert cfg.use_qkv_bias and cfg.tie_word_embeddings
    check(ernie4_5, cfg, hf)


def test_seed_oss_prefill_matches_hf():
    from transformers import SeedOssConfig as HFCfg
    from transformers import SeedOssForCausalLM

    from vllm_trianglemix_tpu.models import seed_oss

    hf_kw = dict(COMMON, head_dim=16, rope_theta=10_000.0,
                 attention_bias=True, attention_out_bias=False,
                 attention_dropout=0.0, rms_norm_eps=1e-6,
                 tie_word_embeddings=False)
    torch.manual_seed(1)
    hf = SeedOssForCausalLM(HFCfg(**hf_kw)).eval().float()
    cfg = seed_oss.SeedOssConfig.from_hf_config(hf_kw)
    assert cfg.use_qkv_bias and not cfg.use_o_bias
    check(seed_oss, cfg, hf)


def test_arcee_prefill_matches_hf():
    from transformers import ArceeConfig as HFCfg
    from transformers import ArceeForCausalLM

    from vllm_trianglemix_tpu.models import arcee

    hf_kw = dict(COMMON, rope_theta=10_000.0, rms_norm_eps=1e-5,
                 tie_word_embeddings=False)
    torch.manual_seed(2)
    hf = ArceeForCausalLM(HFCfg(**hf_kw)).eval().float()
    assert not any("gate_proj" in k for k in hf.state_dict())
    cfg = arcee.ArceeConfig.from_hf_config(hf_kw)
    assert not cfg.gated_mlp and cfg.hidden_act == "relu2"
    check(arcee, cfg, hf)


def test_glm4_prefill_matches_hf():
    from transformers import Glm4Config as HFCfg
    from transformers import Glm4ForCausalLM

    from vllm_trianglemix_tpu.models import glm4

    hf_kw = dict(COMMON, head_dim=16, rope_theta=10_000.0,
                 partial_rotary_factor=0.5, attention_bias=True,
                 rms_norm_eps=1.5625e-07, tie_word_embeddings=False,
                 pad_token_id=0)
    torch.manual_seed(3)
    hf = Glm4ForCausalLM(HFCfg(**hf_kw)).eval().float()
    assert any("post_self_attn_layernorm" in k for k in hf.state_dict())
    assert any("gate_up_proj" in k for k in hf.state_dict())
    cfg = glm4.Glm4Config.from_hf_config(hf_kw)
    assert cfg.sandwich_norm and cfg.rope_interleaved
    check(glm4, cfg, hf)


def test_phimoe_prefill_matches_hf():
    from transformers import PhimoeConfig as HFCfg
    from transformers import PhimoeForCausalLM

    from vllm_trianglemix_tpu.models import phimoe

    hf_kw = dict(COMMON, rope_theta=1_000_000.0, rms_norm_eps=1e-5,
                 num_local_experts=4, num_experts_per_tok=2,
                 attention_bias=True, lm_head_bias=True,
                 router_jitter_noise=0.01, input_jitter_noise=0.0,
                 tie_word_embeddings=False, sliding_window=None)
    torch.manual_seed(4)
    hf = PhimoeForCausalLM(HFCfg(**hf_kw)).eval().float()
    cfg = phimoe.PhimoeConfig.from_hf_config(hf_kw)
    assert cfg.moe_routing == "sparsemixer" and cfg.use_o_bias
    assert cfg.norm_type == "layernorm" and cfg.lm_head_bias
    check(phimoe, cfg, hf)


def test_granitemoe_prefill_matches_hf():
    from transformers import GraniteMoeConfig as HFCfg
    from transformers import GraniteMoeForCausalLM

    from vllm_trianglemix_tpu.models import granitemoe

    hf_kw = dict(COMMON, rope_theta=10_000.0, rms_norm_eps=1e-6,
                 num_local_experts=4, num_experts_per_tok=2,
                 embedding_multiplier=2.0, residual_multiplier=0.5,
                 attention_multiplier=0.3, logits_scaling=1.5,
                 tie_word_embeddings=False, pad_token_id=0)
    torch.manual_seed(5)
    hf = GraniteMoeForCausalLM(HFCfg(**hf_kw)).eval().float()
    assert any("input_linear" in k for k in hf.state_dict())
    cfg = granitemoe.GraniteMoeConfig.from_hf_config(hf_kw)
    assert cfg.embedding_multiplier == 2.0
    assert cfg.attention_multiplier == 0.3
    check(granitemoe, cfg, hf)


def test_dbrx_prefill_matches_hf():
    from transformers import DbrxConfig as HFCfg
    from transformers import DbrxForCausalLM

    from vllm_trianglemix_tpu.models import dbrx

    hf_kw = dict(
        vocab_size=512, d_model=64, n_heads=4, n_layers=2,
        max_seq_len=512, pad_token_id=0,
        attn_config={"kv_n_heads": 2, "clip_qkv": 6.0,
                     "rope_theta": 500_000.0},
        ffn_config={"ffn_hidden_size": 96, "moe_num_experts": 4,
                    "moe_top_k": 2, "moe_normalize_expert_weights": 1.0,
                    "moe_jitter_eps": None},
    )
    torch.manual_seed(6)
    hf = DbrxForCausalLM(HFCfg(**hf_kw)).eval().float()
    assert any("Wqkv" in k for k in hf.state_dict())
    cfg = dbrx.DbrxConfig.from_hf_config(
        dict(hf_kw, eos_token_id=3, bos_token_id=2))
    assert cfg.qkv_clip == 6.0 and cfg.num_experts == 4
    assert cfg.norm_type == "layernorm" and not cfg.norm_bias
    check(dbrx, cfg, hf)


def test_helium_prefill_matches_hf():
    from transformers import HeliumConfig as HFCfg
    from transformers import HeliumForCausalLM

    from vllm_trianglemix_tpu.models import helium

    hf_kw = dict(COMMON, head_dim=16, rope_theta=100_000.0,
                 rms_norm_eps=1e-8, tie_word_embeddings=False,
                 pad_token_id=0)
    torch.manual_seed(7)
    hf = HeliumForCausalLM(HFCfg(**hf_kw)).eval().float()
    cfg = helium.HeliumConfig.from_hf_config(hf_kw)
    check(helium, cfg, hf)


def test_hunyuan_dense_prefill_matches_hf():
    from transformers import HunYuanDenseV1Config as HFCfg
    from transformers import HunYuanDenseV1ForCausalLM

    from vllm_trianglemix_tpu.models import hunyuan

    hf_kw = dict(COMMON, head_dim=16, attention_head_dim=16,
                 rope_theta=10_000.0, rms_norm_eps=1e-5,
                 tie_word_embeddings=False, pad_token_id=0)
    torch.manual_seed(8)
    hf = HunYuanDenseV1ForCausalLM(HFCfg(**hf_kw)).eval().float()
    assert any("query_layernorm" in k for k in hf.state_dict())
    cfg = hunyuan.HunYuanDenseConfig.from_hf_config(hf_kw)
    assert cfg.use_qk_norm
    check(hunyuan, cfg, hf)


def test_granitemoe_shared_prefill_matches_hf():
    from transformers import GraniteMoeSharedConfig as HFCfg
    from transformers import GraniteMoeSharedForCausalLM

    from vllm_trianglemix_tpu.models import granitemoe

    hf_kw = dict(COMMON, rope_theta=10_000.0, rms_norm_eps=1e-6,
                 num_local_experts=4, num_experts_per_tok=2,
                 shared_intermediate_size=48, embedding_multiplier=1.0,
                 residual_multiplier=1.0, attention_multiplier=0.25,
                 logits_scaling=1.0, tie_word_embeddings=False,
                 pad_token_id=0)
    torch.manual_seed(9)
    hf = GraniteMoeSharedForCausalLM(HFCfg(**hf_kw)).eval().float()
    assert any("shared_mlp" in k for k in hf.state_dict())
    cfg = granitemoe.GraniteMoeSharedConfig.from_hf_config(hf_kw)
    assert cfg.shared_expert_intermediate_size == 48
    check(granitemoe, cfg, hf)


def test_seq_cls_heads_load_and_classify():
    """Qwen3/Llama sequence-classification heads: score weights ingest
    and the registry resolves the new architectures."""
    from transformers import (
        LlamaConfig,
        LlamaForSequenceClassification,
        Qwen3Config,
        Qwen3ForSequenceClassification,
    )

    from vllm_trianglemix_tpu.models import seq_cls
    from vllm_trianglemix_tpu.models.registry import resolve_architecture

    for arch, HFC, HFM, extra in (
        ("Qwen3ForSequenceClassification", Qwen3Config,
         Qwen3ForSequenceClassification, dict(head_dim=16)),
        ("LlamaForSequenceClassification", LlamaConfig,
         LlamaForSequenceClassification, {}),
    ):
        module, cfg_cls = resolve_architecture(arch)
        assert module is seq_cls
        hf_kw = dict(COMMON, num_labels=3, pad_token_id=0, **extra)
        torch.manual_seed(10)
        hf = HFM(HFC(**hf_kw)).eval().float()
        cfg = cfg_cls.from_hf_config(hf_kw)
        assert cfg.num_labels == 3
        params = seq_cls.params_from_hf_state_dict(
            cfg, torch_state_dict_reader(hf.state_dict()),
            dtype=jnp.float32)
        assert params["score"].shape == (64, 3)
        # score head on a hidden state matches HF's score linear
        rng = np.random.default_rng(0)
        h = rng.standard_normal((1, 64)).astype(np.float32)
        ours = h @ np.asarray(params["score"])
        with torch.no_grad():
            ref = hf.score(torch.tensor(h)).numpy()
        np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_olmoe_prefill_matches_hf():
    from transformers import OlmoeConfig as HFCfg
    from transformers import OlmoeForCausalLM

    from vllm_trianglemix_tpu.models import olmoe

    hf_kw = dict(COMMON, rope_theta=10_000.0, rms_norm_eps=1e-5,
                 num_experts=4, num_experts_per_tok=2,
                 norm_topk_prob=False, tie_word_embeddings=False,
                 pad_token_id=1)
    torch.manual_seed(7)
    hf = OlmoeForCausalLM(HFCfg(**hf_kw)).eval().float()
    assert any("q_norm" in k for k in hf.state_dict())
    cfg = olmoe.OlmoeConfig.from_hf_config(hf_kw)
    assert cfg.qk_norm_flat and not cfg.norm_topk_prob
    assert cfg.num_experts == 4
    check(olmoe, cfg, hf)


def test_olmoe_norm_topk_variant_matches_hf():
    """norm_topk_prob=True renormalizes the selected router weights."""
    from transformers import OlmoeConfig as HFCfg
    from transformers import OlmoeForCausalLM

    from vllm_trianglemix_tpu.models import olmoe

    hf_kw = dict(COMMON, rope_theta=10_000.0, rms_norm_eps=1e-5,
                 num_experts=4, num_experts_per_tok=2,
                 norm_topk_prob=True, tie_word_embeddings=False,
                 pad_token_id=1)
    torch.manual_seed(8)
    hf = OlmoeForCausalLM(HFCfg(**hf_kw)).eval().float()
    cfg = olmoe.OlmoeConfig.from_hf_config(hf_kw)
    assert cfg.norm_topk_prob
    check(olmoe, cfg, hf)


def test_glm4_moe_prefill_matches_hf():
    """GLM-4.5 MoE: dense prefix + DeepSeek-V3 routing (sigmoid +
    e_score_correction_bias + group top-k) + shared experts."""
    from transformers import Glm4MoeConfig as HFCfg
    from transformers import Glm4MoeForCausalLM

    from vllm_trianglemix_tpu.models import glm4_moe

    hf_kw = dict(COMMON, head_dim=16, rope_theta=10_000.0,
                 moe_intermediate_size=64, n_routed_experts=4,
                 num_experts_per_tok=2, n_shared_experts=1,
                 first_k_dense_replace=1, n_group=2, topk_group=1,
                 routed_scaling_factor=1.5, norm_topk_prob=True,
                 partial_rotary_factor=0.5, attention_bias=True,
                 use_qk_norm=False, rms_norm_eps=1e-5,
                 tie_word_embeddings=False, pad_token_id=0)
    torch.manual_seed(9)
    hf = Glm4MoeForCausalLM(HFCfg(**hf_kw)).eval().float()
    assert any("e_score_correction_bias" in k for k in hf.state_dict())
    assert any("shared_experts" in k for k in hf.state_dict())
    cfg = glm4_moe.Glm4MoeConfig.from_hf_config(hf_kw)
    assert cfg.first_k_dense_replace == 1 and cfg.n_group == 2
    assert cfg.scoring_func == "sigmoid"
    check(glm4_moe, cfg, hf)


def test_glm4_moe_qk_norm_variant_matches_hf():
    from transformers import Glm4MoeConfig as HFCfg
    from transformers import Glm4MoeForCausalLM

    from vllm_trianglemix_tpu.models import glm4_moe

    hf_kw = dict(COMMON, head_dim=16, rope_theta=10_000.0,
                 moe_intermediate_size=64, n_routed_experts=4,
                 num_experts_per_tok=2, n_shared_experts=1,
                 first_k_dense_replace=1, n_group=1, topk_group=1,
                 routed_scaling_factor=1.0, norm_topk_prob=True,
                 partial_rotary_factor=0.5, attention_bias=False,
                 use_qk_norm=True, rms_norm_eps=1e-5,
                 tie_word_embeddings=False, pad_token_id=0)
    torch.manual_seed(10)
    hf = Glm4MoeForCausalLM(HFCfg(**hf_kw)).eval().float()
    assert any("q_norm" in k for k in hf.state_dict())
    cfg = glm4_moe.Glm4MoeConfig.from_hf_config(hf_kw)
    assert cfg.use_qk_norm and not cfg.use_qkv_bias
    check(glm4_moe, cfg, hf)


def test_ernie45_moe_prefill_matches_hf():
    """ERNIE 4.5 MoE: dense prefix + softmax routing with moe_statics
    bias selection and clamped renorm + shared experts."""
    from transformers import Ernie4_5_MoeConfig as HFCfg
    from transformers import Ernie4_5_MoeForCausalLM

    from vllm_trianglemix_tpu.models import ernie4_5_moe

    hf_kw = dict(COMMON, head_dim=16, rope_theta=500_000.0,
                 moe_intermediate_size=64, moe_num_experts=4, moe_k=2,
                 moe_num_shared_experts=1, moe_layer_start_index=1,
                 use_bias=False, rms_norm_eps=1e-5,
                 tie_word_embeddings=True, pad_token_id=0)
    torch.manual_seed(11)
    hf = Ernie4_5_MoeForCausalLM(HFCfg(**hf_kw)).eval().float()
    assert any("moe_statics" in k for k in hf.state_dict())
    cfg = ernie4_5_moe.Ernie45MoeConfig.from_hf_config(hf_kw)
    assert cfg.scoring_func == "softmax" and cfg.moe_renorm_min == 1e-12
    assert cfg.first_k_dense_replace == 1 and cfg.rope_interleaved
    check(ernie4_5_moe, cfg, hf)


def test_ernie45_moe_no_shared_experts_matches_hf():
    from transformers import Ernie4_5_MoeConfig as HFCfg
    from transformers import Ernie4_5_MoeForCausalLM

    from vllm_trianglemix_tpu.models import ernie4_5_moe

    hf_kw = dict(COMMON, head_dim=16, rope_theta=500_000.0,
                 moe_intermediate_size=64, moe_num_experts=4, moe_k=2,
                 moe_num_shared_experts=0, moe_layer_start_index=1,
                 use_bias=False, rms_norm_eps=1e-5,
                 tie_word_embeddings=True, pad_token_id=0)
    torch.manual_seed(12)
    hf = Ernie4_5_MoeForCausalLM(HFCfg(**hf_kw)).eval().float()
    assert not any("shared_experts" in k for k in hf.state_dict())
    cfg = ernie4_5_moe.Ernie45MoeConfig.from_hf_config(hf_kw)
    assert cfg.shared_expert_intermediate_size == 0
    check(ernie4_5_moe, cfg, hf)


def test_deepseek_v1_structural_e2e(tmp_path):
    """DeepSeek-MoE V1: no HF class in-tree — pin the config mapping
    (softmax/greedy, no correction bias, dense prefix) and drive the
    engine e2e from an init_random checkpoint saved to disk."""
    import jax.numpy as jnp

    from vllm_trianglemix_tpu.models import deepseek_v1
    from vllm_trianglemix_tpu.models.registry import resolve_architecture

    module, cfg_cls = resolve_architecture("DeepseekForCausalLM")
    assert module.__name__.endswith("deepseek_v1")
    hf_cfg = dict(
        architectures=["DeepseekForCausalLM"], vocab_size=512,
        hidden_size=64, intermediate_size=128, moe_intermediate_size=64,
        num_hidden_layers=3, num_attention_heads=4,
        num_key_value_heads=2, head_dim=16, n_routed_experts=4,
        num_experts_per_tok=2, n_shared_experts=1,
        first_k_dense_replace=1, moe_layer_freq=1, norm_topk_prob=False,
        rope_theta=10_000.0, rms_norm_eps=1e-6)
    cfg = deepseek_v1.DeepseekV1Config.from_hf_config(hf_cfg)
    assert cfg.scoring_func == "softmax" and not cfg.has_gate_bias
    assert cfg.topk_method == "greedy" and cfg.first_k_dense_replace == 1
    assert cfg.partial_rotary_factor == 1.0

    tree = deepseek_v1.shape_tree(cfg)
    assert "moe_gate_bias" not in tree["moe_layers"]
    assert "gate_proj" in tree["moe_layers"]

    # full engine pass on random params (weights ingest is the shared
    # glm4_moe loader; numerics are pinned by the glm4_moe/ernie tests)
    import jax

    params = deepseek_v1.init_random(cfg, dtype=jnp.float32)
    from vllm_trianglemix_tpu.config import TriangleMixConfig
    from vllm_trianglemix_tpu.attention.metadata import AttentionMetadata

    kv = jnp.zeros((3, 8, 16, 4, 16), jnp.float32)
    ids = jnp.asarray([5, 17, 101], jnp.int32)
    md = AttentionMetadata(
        positions=jnp.arange(3), req_idx=jnp.zeros(3, jnp.int32),
        slot_mapping=jnp.arange(3),
        block_tables=jnp.zeros((1, 8), jnp.int32),
        seq_lens=jnp.asarray([3]), prompt_lens=jnp.asarray([3]),
        query_start_loc=jnp.asarray([0, 3]),
        logits_indices=jnp.asarray([2]), num_reqs=1)
    hidden, new_kv = deepseek_v1.forward(
        params, cfg, TriangleMixConfig(enabled=False), ids, kv, md,
        jnp.zeros(3, jnp.int32))
    logits = deepseek_v1.compute_logits(params, cfg, hidden[-1:])
    assert logits.shape == (1, 512)
    assert bool(jnp.isfinite(logits).all())


def test_persimmon_prefill_matches_hf():
    """Persimmon: fused per-head qkv + qk LayerNorm (with bias) +
    partial rotary + relu^2 biased non-gated MLP."""
    import json

    from transformers import PersimmonConfig as HFCfg
    from transformers import PersimmonForCausalLM

    from vllm_trianglemix_tpu.models import persimmon

    torch.manual_seed(13)
    hf = PersimmonForCausalLM(HFCfg(
        vocab_size=512, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4,
        rope_theta=25_000.0, partial_rotary_factor=0.5,
        tie_word_embeddings=False, pad_token_id=0)).eval().float()
    cfg = persimmon.PersimmonConfig.from_hf_config(
        json.loads(hf.config.to_json_string()))
    assert cfg.qk_norm_type == "layernorm" and cfg.use_qk_norm
    assert cfg.hidden_act == "relu2" and not cfg.gated_mlp
    check(persimmon, cfg, hf)
