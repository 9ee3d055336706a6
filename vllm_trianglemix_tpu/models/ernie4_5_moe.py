"""ERNIE 4.5 MoE (Ernie4_5_MoeForCausalLM): dense prefix + softmax
routing with correction-bias selection.

Reference: vllm/model_executor/models/ernie45_moe.py + HF
transformers/models/ernie4_5_moe/modeling_ernie4_5_moe.py. Structure:

- ERNIE attention (interleaved GLM-style rotary, optional use_bias on
  every linear — models/ernie4_5.py);
- layers before ``moe_layer_start_index`` run a dense SwiGLU MLP; the
  rest route with SOFTMAX scores, select top-k on scores PLUS the
  ``moe_statics.e_score_correction_bias``, and ALWAYS renormalize the
  selected softmax weights with a clamped denominator (moe_norm_min) —
  expressed through deepseek_v2._routed_moe's softmax + bias + renorm
  knobs; optional shared experts ride along;
- the stack split / loaders are glm4_moe.py's two-scan machinery.
"""

from __future__ import annotations

from dataclasses import dataclass, replace
from typing import Any

from vllm_trianglemix_tpu.models import glm4_moe as _stacks
from vllm_trianglemix_tpu.models.decoder import (  # noqa: F401 (re-export)
    DecoderConfig,
    compute_logits,
    kv_cache_spec,
)

SUPPORTS_FUSED_DECODE = False  # two-stack scan; single-step decode only

forward = _stacks.forward
init_random = _stacks.init_random


@dataclass(frozen=True)
class Ernie45MoeConfig(_stacks.Glm4MoeConfig):
    rope_interleaved: bool = True
    partial_rotary_factor: float = 1.0
    rope_theta: float = 500_000.0
    tie_word_embeddings: bool = True
    scoring_func: str = "softmax"
    topk_method: str = "greedy"
    moe_renorm_min: float = 1e-12
    norm_topk_prob: bool = False  # the renorm runs via moe_renorm_min
    eos_token_id: int = 2
    bos_token_id: int = 1

    @classmethod
    def from_hf_config(cls, cfg: dict[str, Any]) -> "Ernie45MoeConfig":
        d = dict(cfg)
        if int(d.get("moe_layer_interval", 1)) != 1:
            raise ValueError("ERNIE moe_layer_interval != 1 is not "
                             "supported (non-contiguous MoE layers)")
        n_exp = d.get("moe_num_experts", 0)
        if isinstance(n_exp, (list, tuple)):     # [text, vision] counts
            n_exp = n_exp[0]
        d["num_experts"] = int(n_exp)
        d["num_experts_per_tok"] = d.get("moe_k", 2)
        d["n_routed_experts"] = d["num_experts"]
        d["n_shared_experts"] = d.get("moe_num_shared_experts", 0)
        d["first_k_dense_replace"] = d.get("moe_layer_start_index", 1)
        base = super().from_hf_config(d)
        bias = bool(d.get("use_bias", False))
        return replace(
            base,
            rope_theta=d.get("rope_theta", 500_000.0),
            partial_rotary_factor=1.0,
            use_qk_norm=False,
            use_qkv_bias=bias,
            use_o_bias=bias,
            use_mlp_bias=bias,
            tie_word_embeddings=d.get("tie_word_embeddings", True),
            scoring_func="softmax",
            topk_method="greedy",
            n_group=1,
            topk_group=1,
            routed_scaling_factor=1.0,
            norm_topk_prob=False,
            moe_renorm_min=d.get("moe_norm_min", 1e-12),
            eos_token_id=d.get("eos_token_id", 2),
            bos_token_id=d.get("bos_token_id", 1),
        )


def shape_tree(cfg: Ernie45MoeConfig) -> dict:
    if cfg.use_mlp_bias and cfg.num_experts > 0:
        raise ValueError("ERNIE MoE with use_bias=True expert biases is "
                         "not supported")
    return _stacks.shape_tree(cfg)


partition_specs = _stacks.partition_specs


def params_from_hf_state_dict(cfg: Ernie45MoeConfig, get_tensor,
                              dtype=None, quant=None, **kw):
    import jax.numpy as jnp

    return _stacks.params_from_hf_state_dict(
        cfg, get_tensor, dtype=dtype if dtype is not None else jnp.bfloat16,
        quant=quant,
        gate_bias_fmt=("model.layers.{i}.mlp.moe_statics"
                       ".e_score_correction_bias"), **kw)
