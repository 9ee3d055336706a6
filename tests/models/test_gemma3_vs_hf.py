"""Gemma-3 (text) numerics parity vs HuggingFace + hybrid-group engine.

Pins the Gemma-3 deltas over Gemma-2: per-head qk-norm, the 5:1
sliding/full layer pattern, the dual rotary tables (global theta with
linear rope scaling vs unscaled local base frequency), and the absence
of logit soft-capping.
"""

import json

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
from transformers import Gemma3TextConfig as HFCfg  # noqa: E402
from transformers import Gemma3ForCausalLM  # noqa: E402

from vllm_trianglemix_tpu.config import TriangleMixConfig  # noqa: E402
from vllm_trianglemix_tpu.models import gemma3  # noqa: E402
from vllm_trianglemix_tpu.models.weights import torch_state_dict_reader  # noqa: E402
from tests.models.test_qwen3_vs_hf import single_seq_metadata  # noqa: E402

BASE = dict(
    vocab_size=256,
    hidden_size=64,
    intermediate_size=128,
    num_hidden_layers=6,
    num_attention_heads=4,
    num_key_value_heads=2,
    head_dim=16,
    sliding_window=8,
    sliding_window_pattern=3,       # 2 sliding : 1 full at 6 layers
    query_pre_attn_scalar=16.0,
    rms_norm_eps=1e-6,
    rope_theta=1_000_000.0,
    rope_local_base_freq=10_000.0,
    rope_scaling={"rope_type": "linear", "factor": 8.0},
    max_position_embeddings=256,
    tie_word_embeddings=True,
)


def build(seed=0):
    torch.manual_seed(seed)
    hf = Gemma3ForCausalLM(HFCfg(
        **BASE, attn_implementation="eager")).eval().float()
    cfg = gemma3.Gemma3Config.from_hf_config(
        json.loads(hf.config.to_json_string()))
    assert cfg.use_qk_norm and cfg.rope_local_base_freq == 10_000.0
    assert cfg.rope_scaling is not None
    assert cfg.rope_scaling.factor == 8.0
    assert not cfg.attn_logit_softcapping
    assert cfg.layer_types.count("full_attention") == 2
    params = gemma3.params_from_hf_state_dict(
        cfg, torch_state_dict_reader(hf.state_dict()), dtype=jnp.float32)
    return hf, cfg, params


def test_gemma3_prefill_matches_hf():
    hf, cfg, params = build()
    rng = np.random.default_rng(0)
    token_ids = rng.integers(3, BASE["vocab_size"], size=33).tolist()
    with torch.no_grad():
        hf_logits = hf(torch.tensor([token_ids])).logits[0].numpy()

    block_size = 8
    num_blocks = 8
    kv = jnp.zeros((cfg.num_hidden_layers,
                    num_blocks, block_size, 2 * cfg.num_key_value_heads,
                    cfg.head_dim), jnp.float32)
    md = single_seq_metadata(len(token_ids), block_size, num_blocks)
    tri = jnp.zeros(cfg.num_hidden_layers, bool)
    hidden, kv = gemma3.forward(params, cfg, TriangleMixConfig(),
                                jnp.asarray(token_ids, jnp.int32), kv, md,
                                tri)
    ours = np.asarray(gemma3.compute_logits(params, cfg, hidden))
    np.testing.assert_allclose(ours, hf_logits, atol=3e-4, rtol=3e-3)


def test_gemma3_engine_e2e(tmp_path):
    from safetensors.torch import save_file

    from vllm_trianglemix_tpu.entrypoints.llm import LLM
    from vllm_trianglemix_tpu.sampling_params import SamplingParams

    hf, cfg, _ = build(seed=1)
    d = tmp_path / "g3"
    d.mkdir()
    hf_cfg = json.loads(hf.config.to_json_string())
    hf_cfg["architectures"] = ["Gemma3ForCausalLM"]
    with open(d / "config.json", "w") as f:
        json.dump(hf_cfg, f)
    save_file({k: v.contiguous() for k, v in hf.state_dict().items()
               if k != "lm_head.weight"},
              str(d / "model.safetensors"))

    llm = LLM(model=str(d), dtype="float32", max_model_len=128,
              block_size=8, max_num_seqs=2, max_num_batched_tokens=64,
              num_kv_blocks=64, skip_tokenizer_init=True)
    assert llm.llm_engine.engine_core.scheduler \
        .kv_cache_manager.n_groups == 2

    rng = np.random.default_rng(1)
    prompts = [rng.integers(3, BASE["vocab_size"], size=n).tolist()
               for n in (21, 40)]  # both beyond the 8-token window
    params = SamplingParams(temperature=0.0, max_tokens=10,
                            ignore_eos=True)
    outs = [o.outputs[0].token_ids for o in llm.generate(prompts, params)]

    hf.generation_config.eos_token_id = None
    for prompt, got in zip(prompts, outs):
        with torch.no_grad():
            ref = hf.generate(torch.tensor([prompt]), do_sample=False,
                              max_new_tokens=10)[0, len(prompt):].tolist()
        assert got == ref
