"""GPT-OSS numerics parity vs HuggingFace: attention sinks, alternating
sliding/full layers, and the clamped interleaved-gate MoE.

Pins models/gpt_oss.py against HF modeling_gpt_oss.py (eager attention
with sink columns + GptOssExperts activation).
"""

import json

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
from transformers import GptOssConfig as HFCfg  # noqa: E402
from transformers import GptOssForCausalLM  # noqa: E402

from tests.models.test_qwen3_vs_hf import single_seq_metadata  # noqa: E402
from vllm_trianglemix_tpu.attention.backend import kv_cache_shape  # noqa: E402
from vllm_trianglemix_tpu.config import TriangleMixConfig  # noqa: E402
from vllm_trianglemix_tpu.models import gpt_oss  # noqa: E402
from vllm_trianglemix_tpu.models.weights import torch_state_dict_reader  # noqa: E402

HF_KW = dict(
    vocab_size=256,
    hidden_size=64,
    intermediate_size=96,
    num_hidden_layers=2,
    num_attention_heads=4,
    num_key_value_heads=2,
    head_dim=16,
    num_local_experts=4,
    num_experts_per_tok=2,
    sliding_window=16,
    rope_theta=10_000.0,
    rope_scaling={"rope_type": "yarn", "factor": 2.0, "beta_fast": 32.0,
                  "beta_slow": 1.0, "truncate": False,
                  "original_max_position_embeddings": 256},
    max_position_embeddings=512,
    tie_word_embeddings=False,
    layer_types=["sliding_attention", "full_attention"],
    eos_token_id=3,
    bos_token_id=2,
    pad_token_id=0,
)


@pytest.fixture(scope="module")
def models():
    torch.manual_seed(0)
    hf = GptOssForCausalLM(HFCfg(**HF_KW)).eval().float()
    cfg = gpt_oss.GptOssConfig.from_hf_config(
        json.loads(hf.config.to_json_string()))
    params = gpt_oss.params_from_hf_state_dict(
        cfg, torch_state_dict_reader(hf.state_dict()), dtype=jnp.float32)
    return hf, cfg, params


def test_config(models):
    _, cfg, _ = models
    assert cfg.layer_types == ("sliding_attention", "full_attention")
    assert cfg.rope_scaling.rope_type == "yarn"
    assert not cfg.rope_scaling.truncate
    assert cfg.num_experts_per_tok == 2 and cfg.swiglu_limit == 7.0


def test_prefill_logits_match_hf(models):
    hf, cfg, params = models
    rng = np.random.default_rng(0)
    token_ids = rng.integers(1, 256, size=41).tolist()  # > sliding window
    seq_len = len(token_ids)
    block_size = 8
    num_blocks = -(-seq_len // block_size) + 2
    kv = jnp.zeros((cfg.num_hidden_layers,
                    *kv_cache_shape(num_blocks, block_size,
                                    cfg.num_key_value_heads,
                                    cfg.head_dim)), jnp.float32)
    md = single_seq_metadata(seq_len, block_size, num_blocks)
    hidden, _ = gpt_oss.forward(params, cfg, TriangleMixConfig(),
                                jnp.asarray(token_ids, jnp.int32), kv, md,
                                jnp.zeros(cfg.num_hidden_layers, bool))
    ours = np.asarray(gpt_oss.compute_logits(params, cfg, hidden))
    with torch.no_grad():
        ref = hf(torch.tensor([token_ids])).logits[0].numpy()
    np.testing.assert_allclose(ours, ref, atol=5e-4, rtol=5e-3)


def test_engine_e2e(models, tmp_path):
    from safetensors.torch import save_file

    from vllm_trianglemix_tpu.entrypoints.llm import LLM
    from vllm_trianglemix_tpu.sampling_params import SamplingParams

    hf, cfg, _ = models
    d = tmp_path / "gptoss"
    d.mkdir()
    cfg_d = json.loads(hf.config.to_json_string())
    cfg_d["architectures"] = ["GptOssForCausalLM"]
    with open(d / "config.json", "w") as f:
        json.dump(cfg_d, f)
    save_file({k: v.clone().contiguous()
               for k, v in hf.state_dict().items()},
              str(d / "model.safetensors"))

    llm = LLM(model=str(d), dtype="float32", max_model_len=128,
              max_num_seqs=2, max_num_batched_tokens=64, num_kv_blocks=48,
              block_size=8, skip_tokenizer_init=True)
    rng = np.random.default_rng(1)
    prompts = [rng.integers(1, 256, size=n).tolist() for n in (25, 9)]
    params = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True)
    outs = [o.outputs[0].token_ids for o in llm.generate(prompts, params)]

    for prompt, got in zip(prompts, outs):
        with torch.no_grad():
            ref = hf.generate(torch.tensor([prompt]), do_sample=False,
                              max_new_tokens=8,
                              eos_token_id=None)[0, len(prompt):].tolist()
        assert list(got) == ref
