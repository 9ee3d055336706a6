"""Phi-3.5-MoE (PhimoeForCausalLM): Mixtral layout + sparsemixer routing.

Reference: vllm/model_executor/models/phimoe.py + HF
transformers/models/phimoe/modeling_phimoe.py — Mixtral expert naming
(block_sparse_moe.experts.{e}.w1/w3/w2), biased LayerNorm norms,
qkv+o biases, optional lm_head bias, and the sparsemixer router
(iterative top-1 with relative-threshold masking; decoder
``moe_routing="sparsemixer"``). Longrope rope scaling is rejected like
Phi-3's.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Any

import jax.numpy as jnp

from vllm_trianglemix_tpu.models import decoder as _dec
from vllm_trianglemix_tpu.models.decoder import (  # noqa: F401 (re-export)
    DecoderConfig,
    compute_logits,
    forward,
    init_random,
    kv_cache_spec,
    partition_specs,
    shape_tree,
)
from vllm_trianglemix_tpu.models.mixtral import _EXPERT_MAP, _LAYER_MAP


@dataclass(frozen=True)
class PhimoeConfig(DecoderConfig):
    norm_type: str = "layernorm"
    moe_routing: str = "sparsemixer"
    use_qkv_bias: bool = True
    use_o_bias: bool = True
    tie_word_embeddings: bool = False
    rope_theta: float = 1_000_000.0
    num_experts: int = 16
    num_experts_per_tok: int = 2
    eos_token_id: int = 32000
    bos_token_id: int = 1

    @classmethod
    def from_hf_config(cls, cfg: dict[str, Any]) -> "PhimoeConfig":
        rs = cfg.get("rope_scaling") or {}
        if rs.get("rope_type", rs.get("type")) in ("longrope", "su"):
            raise ValueError("Phi-3.5-MoE longrope scaling is not "
                             "supported yet")
        d = dict(cfg)
        d.setdefault("num_experts", d.get("num_local_experts", 16))
        d.setdefault("moe_intermediate_size", d["intermediate_size"])
        base = super().from_hf_config(d)
        bias = bool(d.get("attention_bias", True))
        return dataclasses.replace(
            base,
            use_qkv_bias=bias,
            use_o_bias=bias,
            lm_head_bias=bool(d.get("lm_head_bias", False)),
            rms_norm_eps=d.get("rms_norm_eps", 1e-5),
            router_jitter_noise=d.get("router_jitter_noise", 0.01),
        )


_PHIMOE_LAYER_MAP = dict(
    _LAYER_MAP,
    o_bias="model.layers.{i}.self_attn.o_proj.bias",
)


def params_from_hf_state_dict(cfg: PhimoeConfig, get_tensor,
                              dtype=jnp.bfloat16, quant=None, **kw):
    return _dec.params_from_hf_state_dict(
        cfg, get_tensor, dtype=dtype, quant=quant,
        layer_map=_PHIMOE_LAYER_MAP, expert_map=_EXPERT_MAP)
