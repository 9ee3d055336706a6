"""ALiBi model families vs HuggingFace: MPT (fused Wqkv, no_bias,
next-pow2 slopes) and BLOOM (per-head fused qkv, embedding LayerNorm,
closest-pow2 slopes). ALiBi attention runs on the XLA backend path
(attention/backend.py dispatch)."""

import json

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")

from tests.models.test_model_families_vs_hf import run_prefill  # noqa: E402
from vllm_trianglemix_tpu.models.weights import torch_state_dict_reader  # noqa: E402


@pytest.mark.parametrize("n_heads", [4, 8, 6, 12])
def test_mpt_slopes_match_hf(n_heads):
    from transformers.models.mpt.modeling_mpt import build_mpt_alibi_tensor

    from vllm_trianglemix_tpu.models.decoder import alibi_slopes_mpt

    ref = build_mpt_alibi_tensor(n_heads, 4)  # [H, 1, S]
    ref_slopes = (ref[:, 0, 1] - ref[:, 0, 0]).numpy()
    np.testing.assert_allclose(alibi_slopes_mpt(n_heads), ref_slopes,
                               rtol=1e-6)


@pytest.mark.parametrize("n_heads", [4, 8, 6, 12])
def test_bloom_slopes_match_hf(n_heads):
    from transformers.models.bloom.modeling_bloom import build_alibi_tensor

    from vllm_trianglemix_tpu.models.decoder import (
        alibi_slopes_closest_pow2,
    )

    mask = torch.ones(1, 4)
    ref = build_alibi_tensor(mask, n_heads, torch.float32)  # [H, 1, S]
    ref_slopes = (ref[:, 0, 1] - ref[:, 0, 0]).numpy()
    np.testing.assert_allclose(alibi_slopes_closest_pow2(n_heads),
                               ref_slopes, rtol=1e-6)


def _mpt_hf(n_heads=4):
    from transformers import MptConfig as HFCfg
    from transformers import MptForCausalLM

    torch.manual_seed(0)
    hf = MptForCausalLM(HFCfg(
        d_model=64, n_heads=n_heads, n_layers=2, expansion_ratio=4,
        max_seq_len=512, vocab_size=512,
        attn_config={"alibi": True, "alibi_bias_max": 8},
    )).eval().float()
    return hf, json.loads(hf.config.to_json_string())


def test_mpt_prefill_matches_hf():
    from vllm_trianglemix_tpu.models import mpt

    hf, cfg_dict = _mpt_hf()
    cfg = mpt.MptConfig.from_hf_config(cfg_dict)
    assert cfg.alibi_slopes and not cfg.use_rope
    assert not cfg.use_qkv_bias and not cfg.norm_bias
    params = mpt.params_from_hf_state_dict(
        cfg, torch_state_dict_reader(hf.state_dict()), dtype=jnp.float32)
    rng = np.random.default_rng(0)
    token_ids = rng.integers(0, cfg.vocab_size, size=37).tolist()
    with torch.no_grad():
        hf_logits = hf(torch.tensor([token_ids])).logits[0].numpy()
    ours = run_prefill(mpt, cfg, params, token_ids)
    np.testing.assert_allclose(ours, hf_logits, atol=3e-4, rtol=2e-3)


def test_mpt_qk_ln_rejected():
    from vllm_trianglemix_tpu.models import mpt

    _, cfg_dict = _mpt_hf()
    cfg_dict["attn_config"]["qk_ln"] = True
    with pytest.raises(ValueError, match="qk_ln"):
        mpt.MptConfig.from_hf_config(cfg_dict)


def test_bloom_prefill_matches_hf():
    from transformers import BloomConfig as HFCfg
    from transformers import BloomForCausalLM

    from vllm_trianglemix_tpu.models import bloom

    torch.manual_seed(1)
    hf = BloomForCausalLM(HFCfg(
        hidden_size=64, n_head=4, n_layer=2, vocab_size=512,
    )).eval().float()
    cfg = bloom.BloomConfig.from_hf_config(
        json.loads(hf.config.to_json_string()))
    assert cfg.embedding_layernorm and cfg.alibi_slopes
    params = bloom.params_from_hf_state_dict(
        cfg, torch_state_dict_reader(hf.state_dict()), dtype=jnp.float32)
    rng = np.random.default_rng(1)
    token_ids = rng.integers(0, cfg.vocab_size, size=29).tolist()
    with torch.no_grad():
        hf_logits = hf(torch.tensor([token_ids])).logits[0].numpy()
    ours = run_prefill(bloom, cfg, params, token_ids)
    np.testing.assert_allclose(ours, hf_logits, atol=3e-4, rtol=2e-3)


def test_bloom_engine_greedy_matches_hf(tmp_path):
    """e2e decode: ALiBi flows through the fused-decode XLA fallback."""
    from safetensors.torch import save_file
    from transformers import BloomConfig as HFCfg
    from transformers import BloomForCausalLM

    from vllm_trianglemix_tpu.entrypoints.llm import LLM
    from vllm_trianglemix_tpu.sampling_params import SamplingParams

    torch.manual_seed(2)
    hf = BloomForCausalLM(HFCfg(
        hidden_size=64, n_head=4, n_layer=2, vocab_size=512,
    )).eval().float()
    d = tmp_path / "bloom"
    d.mkdir()
    cfg_dict = json.loads(hf.config.to_json_string())
    cfg_dict["architectures"] = ["BloomForCausalLM"]
    with open(d / "config.json", "w") as f:
        json.dump(cfg_dict, f)
    save_file({k: v.clone().contiguous()
               for k, v in hf.state_dict().items()},
              str(d / "model.safetensors"))

    llm = LLM(model=str(d), dtype="float32", max_model_len=128,
              max_num_seqs=2, max_num_batched_tokens=64, num_kv_blocks=32,
              skip_tokenizer_init=True)
    prompt = [5, 17, 101, 8]
    out = llm.generate([prompt], SamplingParams(
        temperature=0.0, max_tokens=6, ignore_eos=True))[0]
    got = list(out.outputs[0].token_ids)
    with torch.no_grad():
        ref = hf.generate(input_ids=torch.tensor([prompt]),
                          do_sample=False, max_new_tokens=6,
                          eos_token_id=None)[0, len(prompt):].tolist()
    assert got == ref


def test_falcon_rw_prefill_matches_hf():
    """falcon-rw: serial block + per-head interleaved fused qkv + ALiBi."""
    from transformers import FalconConfig as HFCfg
    from transformers import FalconForCausalLM

    from vllm_trianglemix_tpu.models import falcon

    torch.manual_seed(3)
    hf = FalconForCausalLM(HFCfg(
        hidden_size=64, num_attention_heads=4, num_hidden_layers=2,
        vocab_size=512, alibi=True, parallel_attn=False,
        multi_query=False, bias=True, new_decoder_architecture=False,
    )).eval().float()
    cfg = falcon.FalconConfig.from_hf_config(
        json.loads(hf.config.to_json_string()))
    assert cfg.alibi_slopes and not cfg.use_rope
    assert not cfg.parallel_block and cfg.use_qkv_bias
    params = falcon.params_from_hf_state_dict(
        cfg, torch_state_dict_reader(hf.state_dict()), dtype=jnp.float32)
    rng = np.random.default_rng(3)
    token_ids = rng.integers(0, cfg.vocab_size, size=31).tolist()
    with torch.no_grad():
        hf_logits = hf(torch.tensor([token_ids])).logits[0].numpy()
    ours = run_prefill(falcon, cfg, params, token_ids)
    np.testing.assert_allclose(ours, hf_logits, atol=3e-4, rtol=2e-3)


def test_baichuan_13b_config_selects_alibi():
    """Baichuan-13B (arch "BaichuanForCausalLM", 40 heads): no HF class
    in-tree (trust_remote_code upstream) — pin the config mapping:
    rope off, closest-pow2 slopes (reference baichuan.py:57,154)."""
    from vllm_trianglemix_tpu.models.baichuan import BaichuanConfig
    from vllm_trianglemix_tpu.models.decoder import (
        alibi_slopes_closest_pow2,
    )

    cfg = BaichuanConfig.from_hf_config(dict(
        architectures=["BaichuanForCausalLM"], vocab_size=64000,
        hidden_size=5120, intermediate_size=13696,
        num_hidden_layers=40, num_attention_heads=40,
        model_max_length=4096))
    assert not cfg.use_rope
    assert cfg.alibi_slopes == alibi_slopes_closest_pow2(40)
    # 7B spelling keeps rope.
    cfg7 = BaichuanConfig.from_hf_config(dict(
        architectures=["BaiChuanForCausalLM"], vocab_size=64000,
        hidden_size=4096, intermediate_size=11008,
        num_hidden_layers=32, num_attention_heads=32))
    assert cfg7.use_rope and cfg7.alibi_slopes is None
