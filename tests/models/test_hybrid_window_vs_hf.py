"""Hybrid sliding/full-window families vs HuggingFace: OLMo-3 (dual
rope tables), EXAONE-4 (global NoPE + per-head qk-norm), Cohere2
(parallel block + NoPE full layers). All serve through
models/hybrid_window.py's period-chunked scan; prompts longer than the
sliding window exercise the per-layer window masks."""

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
    intermediate_size=128,
    num_hidden_layers=4,
    num_attention_heads=4,
    num_key_value_heads=2,
    max_position_embeddings=512,
    sliding_window=8,            # << seq length: windows really bite
    eos_token_id=3,
    bos_token_id=2,
)
SEQ = 37


def check(module, cfg, hf, atol=3e-4):
    params = module.params_from_hf_state_dict(
        cfg, torch_state_dict_reader(hf.state_dict()), dtype=jnp.float32)
    rng = np.random.default_rng(0)
    token_ids = rng.integers(0, cfg.vocab_size, size=SEQ).tolist()
    with torch.no_grad():
        hf_logits = hf(torch.tensor([token_ids])).logits[0].numpy()
    ours = run_prefill(module, cfg, params, token_ids)
    np.testing.assert_allclose(ours, hf_logits, atol=atol, rtol=2e-3)


def test_olmo3_prefill_matches_hf():
    from transformers import Olmo3Config as HFCfg
    from transformers import Olmo3ForCausalLM

    from vllm_trianglemix_tpu.models import olmo3

    hf_kw = dict(COMMON, rope_theta=10_000.0, rms_norm_eps=1e-6,
                 rope_scaling={"rope_type": "linear", "factor": 4.0},
                 tie_word_embeddings=False, pad_token_id=1)
    torch.manual_seed(0)
    hf = Olmo3ForCausalLM(HFCfg(**hf_kw)).eval().float()
    cfg_dict = json.loads(hf.config.to_json_string())
    cfg = olmo3.Olmo3Config.from_hf_config(cfg_dict)
    assert cfg.layer_types[:4] == ("sliding_attention",) * 3 + (
        "full_attention",)
    assert cfg.full_attention_rope == "scaled"
    assert cfg.rope_scaling is not None   # full layers scale, sliding not
    check(olmo3, cfg, hf)


def test_exaone4_prefill_matches_hf():
    from transformers import Exaone4Config as HFCfg
    from transformers import Exaone4ForCausalLM

    from vllm_trianglemix_tpu.models import exaone4

    hf_kw = dict(COMMON, head_dim=16, rope_theta=1_000_000.0,
                 rms_norm_eps=1e-5, tie_word_embeddings=False,
                 pad_token_id=0)
    torch.manual_seed(1)
    hf = Exaone4ForCausalLM(HFCfg(**hf_kw)).eval().float()
    cfg_dict = json.loads(hf.config.to_json_string())
    cfg = exaone4.Exaone4Config.from_hf_config(cfg_dict)
    assert cfg.postnorm and cfg.use_qk_norm and not cfg.qk_norm_flat
    assert cfg.full_attention_rope == "none"   # global NoPE
    check(exaone4, cfg, hf)


def test_exaone4_dense_variant_ropes_everywhere():
    """EXAONE-4.0-1.2B style: no sliding layers -> rope on all layers."""
    from transformers import Exaone4Config as HFCfg
    from transformers import Exaone4ForCausalLM

    from vllm_trianglemix_tpu.models import exaone4

    hf_kw = dict(COMMON, head_dim=16, rope_theta=1_000_000.0,
                 rms_norm_eps=1e-5, sliding_window=None,
                 layer_types=["full_attention"] * 4,
                 tie_word_embeddings=False, pad_token_id=0)
    torch.manual_seed(2)
    hf = Exaone4ForCausalLM(HFCfg(**hf_kw)).eval().float()
    cfg_dict = json.loads(hf.config.to_json_string())
    cfg = exaone4.Exaone4Config.from_hf_config(cfg_dict)
    assert all(t == "full_attention" for t in cfg.layer_types)
    assert cfg.full_attention_rope == "scaled"
    check(exaone4, cfg, hf)


def test_cohere2_prefill_matches_hf():
    from transformers import Cohere2Config as HFCfg
    from transformers import Cohere2ForCausalLM

    from vllm_trianglemix_tpu.models import cohere2

    hf_kw = dict(COMMON, rope_theta=10_000.0, layer_norm_eps=1e-5,
                 logit_scale=0.125, tie_word_embeddings=True,
                 pad_token_id=0)
    torch.manual_seed(3)
    hf = Cohere2ForCausalLM(HFCfg(**hf_kw)).eval().float()
    cfg_dict = json.loads(hf.config.to_json_string())
    cfg = cohere2.Cohere2Config.from_hf_config(cfg_dict)
    assert cfg.parallel_block and cfg.rope_interleaved
    assert cfg.full_attention_rope == "none"
    assert abs(cfg.logits_scaling - 8.0) < 1e-9
    check(cohere2, cfg, hf)


def test_olmo3_engine_greedy_matches_hf(tmp_path):
    """e2e with per-type KV-cache groups through the engine."""
    from safetensors.torch import save_file
    from transformers import Olmo3Config as HFCfg
    from transformers import Olmo3ForCausalLM

    from vllm_trianglemix_tpu.entrypoints.llm import LLM
    from vllm_trianglemix_tpu.sampling_params import SamplingParams

    hf_kw = dict(COMMON, rope_theta=10_000.0, rms_norm_eps=1e-6,
                 tie_word_embeddings=False, pad_token_id=1)
    torch.manual_seed(4)
    hf = Olmo3ForCausalLM(HFCfg(**hf_kw)).eval().float()
    d = tmp_path / "olmo3"
    d.mkdir()
    cfg_dict = json.loads(hf.config.to_json_string())
    cfg_dict["architectures"] = ["Olmo3ForCausalLM"]
    with open(d / "config.json", "w") as f:
        json.dump(cfg_dict, f)
    save_file({k: v.clone().contiguous()
               for k, v in hf.state_dict().items()},
              str(d / "model.safetensors"))

    llm = LLM(model=str(d), dtype="float32", max_model_len=128,
              max_num_seqs=2, max_num_batched_tokens=64, num_kv_blocks=32,
              skip_tokenizer_init=True)
    prompt = list(range(5, 25))     # longer than the window of 8
    out = llm.generate([prompt], SamplingParams(
        temperature=0.0, max_tokens=6, ignore_eos=True))[0]
    got = list(out.outputs[0].token_ids)
    with torch.no_grad():
        ref = hf.generate(input_ids=torch.tensor([prompt]),
                          do_sample=False, max_new_tokens=6,
                          eos_token_id=None)[0, len(prompt):].tolist()
    assert got == ref
