"""Numerics parity for the Qwen2 and Llama families vs HuggingFace torch.

Same strategy as test_qwen3_vs_hf.py (HfRunner-vs-VllmRunner analogue,
reference tests/conftest.py:256,695): seeded random HF model, token-level
logit comparison through our paged engine forward.
"""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
from transformers import LlamaConfig as HFLlamaConfig  # noqa: E402
from transformers import LlamaForCausalLM  # noqa: E402
from transformers import Qwen2Config as HFQwen2Config  # noqa: E402
from transformers import Qwen2ForCausalLM  # noqa: E402

from vllm_trianglemix_tpu.attention.backend import kv_cache_shape  # noqa: E402
from vllm_trianglemix_tpu.config import TriangleMixConfig  # noqa: E402
from vllm_trianglemix_tpu.models import llama, qwen2  # noqa: E402
from vllm_trianglemix_tpu.models.weights import torch_state_dict_reader  # noqa: E402
from tests.models.test_qwen3_vs_hf import single_seq_metadata  # noqa: E402

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


def run_prefill(module, cfg, params, token_ids, block_size=8):
    seq_len = len(token_ids)
    num_blocks = -(-seq_len // block_size) + 2
    kv = jnp.zeros((cfg.num_hidden_layers,
                    *kv_cache_shape(num_blocks, block_size,
                                    cfg.num_key_value_heads, cfg.head_dim)),
                   jnp.float32)
    md = single_seq_metadata(seq_len, block_size, num_blocks)
    tri_flags = jnp.zeros(cfg.num_hidden_layers, bool)
    hidden, kv = module.forward(params, cfg, TriangleMixConfig(),
                                jnp.asarray(token_ids, jnp.int32), kv, md,
                                tri_flags)
    return np.asarray(module.compute_logits(params, cfg, hidden))


def test_qwen2_prefill_matches_hf():
    hf_kw = dict(COMMON, rope_theta=1_000_000.0, tie_word_embeddings=True)
    torch.manual_seed(0)
    hf = Qwen2ForCausalLM(HFQwen2Config(**hf_kw)).eval().float()

    cfg = qwen2.Qwen2Config.from_hf_config(hf_kw)
    assert cfg.use_qkv_bias and not cfg.use_qk_norm
    params = qwen2.params_from_hf_state_dict(
        cfg, torch_state_dict_reader(hf.state_dict()), dtype=jnp.float32)

    rng = np.random.default_rng(0)
    token_ids = rng.integers(0, hf_kw["vocab_size"], size=37).tolist()
    with torch.no_grad():
        hf_logits = hf(torch.tensor([token_ids])).logits[0].numpy()
    ours = run_prefill(qwen2, cfg, params, token_ids)
    np.testing.assert_allclose(ours, hf_logits, atol=2e-4, rtol=2e-3)


def test_llama_prefill_matches_hf():
    hf_kw = dict(COMMON, rope_theta=500_000.0, tie_word_embeddings=False,
                 attention_bias=False)
    torch.manual_seed(1)
    hf = LlamaForCausalLM(HFLlamaConfig(**hf_kw)).eval().float()

    cfg = llama.LlamaConfig.from_hf_config(hf_kw)
    assert not cfg.use_qkv_bias and not cfg.use_qk_norm
    assert not cfg.tie_word_embeddings
    params = llama.params_from_hf_state_dict(
        cfg, torch_state_dict_reader(hf.state_dict()), dtype=jnp.float32)

    rng = np.random.default_rng(1)
    token_ids = rng.integers(0, hf_kw["vocab_size"], size=29).tolist()
    with torch.no_grad():
        hf_logits = hf(torch.tensor([token_ids])).logits[0].numpy()
    ours = run_prefill(llama, cfg, params, token_ids)
    np.testing.assert_allclose(ours, hf_logits, atol=2e-4, rtol=2e-3)


def test_mistral_prefill_matches_hf():
    from transformers import MistralConfig as HFMistralConfig
    from transformers import MistralForCausalLM

    from vllm_trianglemix_tpu.models import mistral

    hf_kw = dict(COMMON, rope_theta=10_000.0, tie_word_embeddings=False,
                 head_dim=16, sliding_window=None)
    torch.manual_seed(2)
    hf = MistralForCausalLM(HFMistralConfig(**hf_kw)).eval().float()

    cfg = mistral.MistralConfig.from_hf_config(hf_kw)
    assert not cfg.use_qkv_bias and not cfg.use_qk_norm
    params = mistral.params_from_hf_state_dict(
        cfg, torch_state_dict_reader(hf.state_dict()), dtype=jnp.float32)

    rng = np.random.default_rng(2)
    token_ids = rng.integers(0, hf_kw["vocab_size"], size=31).tolist()
    with torch.no_grad():
        hf_logits = hf(torch.tensor([token_ids])).logits[0].numpy()
    ours = run_prefill(mistral, cfg, params, token_ids)
    np.testing.assert_allclose(ours, hf_logits, atol=2e-4, rtol=2e-3)


def test_mixtral_prefill_matches_hf():
    from transformers import MixtralConfig as HFMixtralConfig
    from transformers import MixtralForCausalLM

    from vllm_trianglemix_tpu.models import mixtral

    hf_kw = dict(COMMON, rope_theta=1_000_000.0, tie_word_embeddings=False,
                 head_dim=16, num_local_experts=4, num_experts_per_tok=2,
                 sliding_window=None)
    torch.manual_seed(3)
    hf = MixtralForCausalLM(HFMixtralConfig(**hf_kw)).eval().float()

    cfg = mixtral.MixtralConfig.from_hf_config(hf_kw)
    assert cfg.num_experts == 4 and cfg.num_experts_per_tok == 2
    assert cfg.moe_intermediate_size == hf_kw["intermediate_size"]
    params = mixtral.params_from_hf_state_dict(
        cfg, torch_state_dict_reader(hf.state_dict()), dtype=jnp.float32)

    rng = np.random.default_rng(3)
    token_ids = rng.integers(0, hf_kw["vocab_size"], size=27).tolist()
    with torch.no_grad():
        hf_logits = hf(torch.tensor([token_ids])).logits[0].numpy()
    ours = run_prefill(mixtral, cfg, params, token_ids)
    np.testing.assert_allclose(ours, hf_logits, atol=5e-4, rtol=5e-3)


def test_registry_resolves_all_families():
    from vllm_trianglemix_tpu.models.registry import (
        resolve_architecture,
        supported_architectures,
    )

    for arch in supported_architectures():
        module, cfg_cls = resolve_architecture(arch)
        assert hasattr(module, "forward") and hasattr(module, "shape_tree")
        cfg_cls()  # default-constructible
