"""Qwen3-MoE numerics parity vs HuggingFace torch (fp32)."""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
from transformers import Qwen3MoeConfig as HFQwen3MoeConfig  # noqa: E402
from transformers import Qwen3MoeForCausalLM  # noqa: E402

from vllm_trianglemix_tpu.attention.backend import kv_cache_shape  # noqa: E402
from vllm_trianglemix_tpu.config import TriangleMixConfig  # noqa: E402
from vllm_trianglemix_tpu.models import qwen3_moe  # noqa: E402
from vllm_trianglemix_tpu.models.weights import torch_state_dict_reader  # noqa: E402
from tests.models.test_qwen3_vs_hf import single_seq_metadata  # noqa: E402

HF_KW = dict(
    vocab_size=512,
    hidden_size=64,
    intermediate_size=128,
    moe_intermediate_size=48,
    num_hidden_layers=2,
    num_attention_heads=4,
    num_key_value_heads=2,
    head_dim=16,
    num_experts=4,
    num_experts_per_tok=2,
    decoder_sparse_step=1,
    mlp_only_layers=[],
    norm_topk_prob=True,
    max_position_embeddings=512,
    rope_theta=1_000_000.0,
    rms_norm_eps=1e-6,
    tie_word_embeddings=True,
    eos_token_id=3,
    bos_token_id=2,
)


def test_moe_prefill_matches_hf():
    torch.manual_seed(0)
    hf = Qwen3MoeForCausalLM(HFQwen3MoeConfig(**HF_KW)).eval().float()

    cfg = qwen3_moe.Qwen3MoeConfig.from_hf_config(HF_KW)
    assert cfg.num_experts == 4 and cfg.num_experts_per_tok == 2
    params = qwen3_moe.params_from_hf_state_dict(
        cfg, torch_state_dict_reader(hf.state_dict()), dtype=jnp.float32)

    rng = np.random.default_rng(0)
    token_ids = rng.integers(0, HF_KW["vocab_size"], size=25).tolist()
    with torch.no_grad():
        hf_logits = hf(torch.tensor([token_ids])).logits[0].numpy()

    block_size = 8
    num_blocks = -(-len(token_ids) // block_size) + 2
    kv = jnp.zeros((cfg.num_hidden_layers,
                    *kv_cache_shape(num_blocks, block_size,
                                    cfg.num_key_value_heads,
                                    cfg.head_dim)), jnp.float32)
    md = single_seq_metadata(len(token_ids), block_size, num_blocks)
    hidden, _ = qwen3_moe.forward(params, cfg, TriangleMixConfig(),
                                  jnp.asarray(token_ids, jnp.int32), kv, md,
                                  jnp.zeros(cfg.num_hidden_layers, bool))
    ours = np.asarray(qwen3_moe.compute_logits(params, cfg, hidden))
    np.testing.assert_allclose(ours, hf_logits, atol=5e-4, rtol=5e-3)


def test_moe_engine_generates(tmp_path):
    import json

    from vllm_trianglemix_tpu.entrypoints.llm import LLM
    from vllm_trianglemix_tpu.sampling_params import SamplingParams

    d = tmp_path / "moe"
    d.mkdir()
    cfg = dict(HF_KW, architectures=["Qwen3MoeForCausalLM"])
    with open(d / "config.json", "w") as f:
        json.dump(cfg, f)
    llm = LLM(model=str(d), dtype="float32", max_model_len=128,
              max_num_seqs=4, max_num_batched_tokens=64, num_kv_blocks=48,
              skip_tokenizer_init=True)
    outs = llm.generate([[5, 6, 7, 8]],
                        SamplingParams(max_tokens=5, temperature=0.0,
                                       ignore_eos=True))
    assert len(outs[0].outputs[0].token_ids) == 5
