"""OPT: learned positions (+2 pad offset), ReLU MLP, LayerNorm blocks.

Reference: vllm/model_executor/models/opt.py + HF
transformers/models/opt/modeling_opt.py — embed_tokens + embed_positions
(the table stores 2 leading pad rows and indexes position + 2), pre-norm
LayerNorm blocks (self_attn_layer_norm / final_layer_norm), biased
q/k/v/out projections, non-gated ReLU fc1/fc2 MLP, top-level
final_layer_norm, tied lm_head. Pure decoder knobs + a name shim.
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
class OPTConfig(DecoderConfig):
    use_rope: bool = False
    learned_pos_embeddings: bool = True
    pos_embedding_offset: int = 2
    norm_type: str = "layernorm"
    gated_mlp: bool = False
    hidden_act: str = "relu"
    use_qkv_bias: bool = True
    use_o_bias: bool = True
    use_mlp_bias: bool = True
    tie_word_embeddings: bool = True
    rope_theta: float = 0.0
    eos_token_id: int = 2
    bos_token_id: int = 2

    @classmethod
    def from_hf_config(cls, cfg) -> "OPTConfig":
        d = dict(cfg)
        if not d.get("do_layer_norm_before", True):
            raise ValueError("OPT do_layer_norm_before=False (350m-style "
                             "post-norm) is not supported")
        if d.get("word_embed_proj_dim", d["hidden_size"]) != d["hidden_size"]:
            raise ValueError("OPT word_embed_proj_dim != hidden_size "
                             "(project_in/out) is not supported")
        heads = d["num_attention_heads"]
        bias = bool(d.get("enable_bias", True))
        return cls(
            vocab_size=d["vocab_size"],
            hidden_size=d["hidden_size"],
            intermediate_size=d.get("ffn_dim", 4 * d["hidden_size"]),
            num_hidden_layers=d["num_hidden_layers"],
            num_attention_heads=heads,
            num_key_value_heads=heads,
            head_dim=d["hidden_size"] // heads,
            rms_norm_eps=1e-5,
            max_position_embeddings=d.get("max_position_embeddings", 2048),
            use_qkv_bias=bias,
            use_o_bias=bias,
            use_mlp_bias=bias,
            hidden_act={"relu": "relu", "gelu": "gelu"}.get(
                d.get("activation_function", "relu"), "relu"),
            tie_word_embeddings=d.get("tie_word_embeddings", True),
            eos_token_id=d.get("eos_token_id", 2),
            bos_token_id=d.get("bos_token_id", 2),
        )


_RX = re.compile(r"model\.layers\.(\d+)\.(.+)")

_LEAF = {
    "input_layernorm.weight": "self_attn_layer_norm.weight",
    "input_layernorm.bias": "self_attn_layer_norm.bias",
    "post_attention_layernorm.weight": "final_layer_norm.weight",
    "post_attention_layernorm.bias": "final_layer_norm.bias",
    "self_attn.q_proj.weight": "self_attn.q_proj.weight",
    "self_attn.q_proj.bias": "self_attn.q_proj.bias",
    "self_attn.k_proj.weight": "self_attn.k_proj.weight",
    "self_attn.k_proj.bias": "self_attn.k_proj.bias",
    "self_attn.v_proj.weight": "self_attn.v_proj.weight",
    "self_attn.v_proj.bias": "self_attn.v_proj.bias",
    "self_attn.o_proj.weight": "self_attn.out_proj.weight",
    "self_attn.o_proj.bias": "self_attn.out_proj.bias",
    "mlp.up_proj.weight": "fc1.weight",
    "mlp.up_proj.bias": "fc1.bias",
    "mlp.down_proj.weight": "fc2.weight",
    "mlp.down_proj.bias": "fc2.bias",
}


def _shim(get_tensor):
    def shim(name: str):
        top = {
            "model.embed_tokens.weight": "model.decoder.embed_tokens.weight",
            "model.embed_positions.weight":
                "model.decoder.embed_positions.weight",
            "model.norm.weight": "model.decoder.final_layer_norm.weight",
            "model.norm.bias": "model.decoder.final_layer_norm.bias",
        }
        if name in top:
            return get_tensor(top[name])
        m = _RX.fullmatch(name)
        assert m, name
        return get_tensor(
            f"model.decoder.layers.{m.group(1)}.{_LEAF[m.group(2)]}")

    return shim


def params_from_hf_state_dict(cfg: OPTConfig, get_tensor,
                              dtype=jnp.bfloat16, quant=None, **kw):
    if quant is not None:
        raise ValueError("quantized OPT checkpoints are not supported yet")
    return decoder.params_from_hf_state_dict(
        cfg, _shim(get_tensor), dtype=dtype, **kw)
