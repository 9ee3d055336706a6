"""Phi-1.5 / Phi-2: parallel shared-norm block + partial rotary.

Reference: vllm/model_executor/models/phi.py + HF
transformers/models/phi/modeling_phi.py — ONE input LayerNorm feeds both
attention and the MLP (parallel residual: x + attn(h) + mlp(h)), rotary
over partial_rotary_factor of head_dim, biased q/k/v/dense and fc1/fc2
(non-gated gelu_new), top-level final_layernorm, untied lm_head WITH
bias.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

import jax.numpy as jnp

from vllm_trianglemix_tpu.models import decoder
from vllm_trianglemix_tpu.models.decoder import (  # noqa: F401 (re-export)
    DecoderConfig,
    compute_logits,
    forward,
    init_random,
    kv_cache_spec,
    partition_specs,
    shape_tree,
)


@dataclass(frozen=True)
class PhiConfig(DecoderConfig):
    norm_type: str = "layernorm"
    gated_mlp: bool = False
    hidden_act: str = "gelu_tanh"
    use_qkv_bias: bool = True
    use_o_bias: bool = True
    use_mlp_bias: bool = True
    parallel_block: bool = True
    parallel_block_shared_norm: bool = True
    partial_rotary_factor: float = 0.5
    tie_word_embeddings: bool = False
    lm_head_bias: bool = True
    rope_theta: float = 10_000.0
    eos_token_id: int = 50256
    bos_token_id: int = 50256

    @classmethod
    def from_hf_config(cls, cfg) -> "PhiConfig":
        d = dict(cfg)
        if d.get("qk_layernorm", False):
            raise ValueError("Phi qk_layernorm checkpoints are not "
                             "supported yet")
        heads = d["num_attention_heads"]
        return cls(
            vocab_size=d["vocab_size"],
            hidden_size=d["hidden_size"],
            intermediate_size=d["intermediate_size"],
            num_hidden_layers=d["num_hidden_layers"],
            num_attention_heads=heads,
            num_key_value_heads=d.get("num_key_value_heads") or heads,
            head_dim=d["hidden_size"] // heads,
            rms_norm_eps=d.get("layer_norm_eps", 1e-5),
            rope_theta=d.get("rope_theta", 10_000.0),
            partial_rotary_factor=d.get("partial_rotary_factor", 0.5),
            max_position_embeddings=d.get("max_position_embeddings", 2048),
            tie_word_embeddings=d.get("tie_word_embeddings", False),
            eos_token_id=d.get("eos_token_id") or 50256,
            bos_token_id=d.get("bos_token_id") or 50256,
        )


_RX = re.compile(r"model\.layers\.(\d+)\.(.+)")

_LEAF = {
    "self_attn.o_proj.weight": "self_attn.dense.weight",
    "self_attn.o_proj.bias": "self_attn.dense.bias",
    "mlp.up_proj.weight": "mlp.fc1.weight",
    "mlp.up_proj.bias": "mlp.fc1.bias",
    "mlp.down_proj.weight": "mlp.fc2.weight",
    "mlp.down_proj.bias": "mlp.fc2.bias",
}


def _shim(get_tensor):
    def shim(name: str):
        if name == "model.norm.weight":
            return get_tensor("model.final_layernorm.weight")
        if name == "model.norm.bias":
            return get_tensor("model.final_layernorm.bias")
        m = _RX.fullmatch(name)
        if m and m.group(2) in _LEAF:
            return get_tensor(
                f"model.layers.{m.group(1)}.{_LEAF[m.group(2)]}")
        return get_tensor(name)

    return shim


def params_from_hf_state_dict(cfg: PhiConfig, get_tensor,
                              dtype=jnp.bfloat16, quant=None, **kw):
    if quant is not None:
        raise ValueError("quantized Phi checkpoints are not supported yet")
    return decoder.params_from_hf_state_dict(
        cfg, _shim(get_tensor), dtype=dtype, **kw)
