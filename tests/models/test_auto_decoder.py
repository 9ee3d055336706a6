"""Generic decoder fallback (models/auto_decoder.py, the reference's
TransformersForCausalLM role): an unregistered *ForCausalLM architecture
with llama-canonical structure serves token-identically to the llama
path; unsupported structures and non-canonical weights fail loudly."""

import json
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def unknown_arch_dir(tmp_path_factory):
    """A tiny llama checkpoint whose config claims an arch nobody
    registered."""
    from safetensors.torch import save_file
    from transformers import LlamaConfig, LlamaForCausalLM

    d = tmp_path_factory.mktemp("frobnicator")
    torch.manual_seed(0)
    hf = LlamaForCausalLM(LlamaConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, attention_bias=True,
        tie_word_embeddings=False)).eval().float()
    cfg = json.loads(hf.config.to_json_string())
    save_file({k: v.contiguous() for k, v in hf.state_dict().items()},
              os.path.join(d, "model.safetensors"))
    for arch, sub in (("FrobnicatorForCausalLM", "unknown"),
                      ("LlamaForCausalLM", "llama")):
        os.makedirs(os.path.join(d, sub), exist_ok=True)
        os.symlink(os.path.join(d, "model.safetensors"),
                   os.path.join(d, sub, "model.safetensors"))
        with open(os.path.join(d, sub, "config.json"), "w") as f:
            json.dump(dict(cfg, architectures=[arch]), f)
    return str(d)


def generate(model_dir):
    from vllm_trianglemix_tpu.entrypoints.llm import LLM
    from vllm_trianglemix_tpu.sampling_params import SamplingParams

    llm = LLM(model=model_dir, dtype="float32", max_model_len=128,
              max_num_seqs=2, max_num_batched_tokens=64, num_kv_blocks=32,
              skip_tokenizer_init=True)
    outs = llm.generate([[5, 17, 101, 9]],
                        SamplingParams(temperature=0.0, max_tokens=8,
                                       ignore_eos=True))
    return list(outs[0].outputs[0].token_ids)


def test_fallback_serves_unknown_arch_token_identically(unknown_arch_dir):
    via_llama = generate(os.path.join(unknown_arch_dir, "llama"))
    via_fallback = generate(os.path.join(unknown_arch_dir, "unknown"))
    assert via_fallback == via_llama


def test_fallback_resolution_and_config_mapping(unknown_arch_dir):
    from vllm_trianglemix_tpu.models.registry import resolve_model

    module, cfg = resolve_model(os.path.join(unknown_arch_dir, "unknown"))
    assert module.__name__.endswith("auto_decoder")
    assert cfg.use_qkv_bias and not cfg.tie_word_embeddings
    assert cfg.hidden_size == 64


@pytest.mark.parametrize("bad_cfg,match", [
    (dict(num_local_experts=8), "mixture-of-experts"),
    (dict(vision_config={"patch": 14}), "vision"),
    (dict(hidden_act="xielu"), "hidden_act"),
    (dict(state_size=16), "state-space"),
    (dict(is_encoder_decoder=True), "encoder-decoder"),
    (dict(layer_types=["full_attention", "sliding_attention"],
          sliding_window=64), "layer_types"),
])
def test_fallback_rejects_unsupported_structure(bad_cfg, match):
    from vllm_trianglemix_tpu.models.auto_decoder import (
        AutoDecoderConfig,
        UnsupportedModelError,
    )

    base = dict(architectures=["MysteryForCausalLM"], vocab_size=256,
                hidden_size=64, intermediate_size=128,
                num_hidden_layers=2, num_attention_heads=4)
    with pytest.raises(UnsupportedModelError, match=match):
        AutoDecoderConfig.from_hf_config({**base, **bad_cfg})


def test_unknown_non_causal_arch_still_rejected():
    from vllm_trianglemix_tpu.models.registry import resolve_architecture

    with pytest.raises(ValueError, match="Unsupported architecture"):
        resolve_architecture("MysterySeq2SeqModel", allow_fallback=True)


def test_fallback_non_canonical_weights_fail_loudly(tmp_path):
    from vllm_trianglemix_tpu.models.auto_decoder import (
        AutoDecoderConfig,
        UnsupportedModelError,
        params_from_hf_state_dict,
    )

    cfg = AutoDecoderConfig.from_hf_config(dict(
        architectures=["MysteryForCausalLM"], vocab_size=256,
        hidden_size=64, intermediate_size=128, num_hidden_layers=1,
        num_attention_heads=4))

    def get_tensor(name):
        raise KeyError(name)

    with pytest.raises(UnsupportedModelError, match="llama-canonical"):
        params_from_hf_state_dict(cfg, get_tensor)


def test_registry_alias_architectures_resolve():
    """Llama-structured aliases and respelled names route to the real
    family modules, not the fallback (reference registry.py alias rows)."""
    from vllm_trianglemix_tpu.models.registry import resolve_architecture

    expect = {
        "AquilaForCausalLM": "llama",
        "AquilaModel": "llama",
        "CwmForCausalLM": "llama",
        "InternLM3ForCausalLM": "llama",
        "LLaMAForCausalLM": "llama",
        "MiMoForCausalLM": "qwen2",
        "PhiMoEForCausalLM": "phimoe",
        "RWForCausalLM": "falcon",
        "StableLMEpochForCausalLM": "stablelm",
    }
    for arch, mod in expect.items():
        module, _cfg = resolve_architecture(arch)
        assert module.__name__.rsplit(".", 1)[-1] == mod, arch


def test_attention_bias_key_honored_only_when_present():
    from vllm_trianglemix_tpu.models.llama import LlamaConfig
    from vllm_trianglemix_tpu.models.qwen2 import Qwen2Config

    base = dict(vocab_size=256, hidden_size=64, intermediate_size=128,
                num_hidden_layers=1, num_attention_heads=4)
    assert not LlamaConfig.from_hf_config(base).use_qkv_bias
    assert LlamaConfig.from_hf_config(
        {**base, "attention_bias": True}).use_qkv_bias
    assert LlamaConfig.from_hf_config(
        {**base, "qkv_bias": True}).use_qkv_bias
    # Absent key must not clobber a bias-on subclass default (Qwen2).
    assert Qwen2Config.from_hf_config(base).use_qkv_bias
