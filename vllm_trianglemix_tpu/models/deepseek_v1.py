"""DeepSeek-MoE V1 (DeepseekForCausalLM): GQA attention + softmax-top-k
MoE with shared experts.

Reference: vllm/model_executor/models/deepseek.py — unlike V2/V3 there
is NO latent attention: standard llama-style GQA with full rotate-half
rotary; the MoE is softmax scores → greedy top-k (renormalized iff
``norm_topk_prob``) over per-expert SwiGLU MLPs plus
``n_shared_experts`` always-on shared experts, with the first
``first_k_dense_replace`` layers dense (deepseek-moe-16b ships 1).
Served through glm4_moe.py's two-stack scan with the softmax/greedy
routing knobs and no correction bias.
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

SUPPORTS_FUSED_DECODE = False

forward = _stacks.forward
init_random = _stacks.init_random
shape_tree = _stacks.shape_tree
partition_specs = _stacks.partition_specs
params_from_hf_state_dict = _stacks.params_from_hf_state_dict


@dataclass(frozen=True)
class DeepseekV1Config(_stacks.Glm4MoeConfig):
    partial_rotary_factor: float = 1.0
    rope_theta: float = 10_000.0
    scoring_func: str = "softmax"
    topk_method: str = "greedy"
    has_gate_bias: bool = False
    norm_topk_prob: bool = False
    eos_token_id: int = 100001
    bos_token_id: int = 100000

    @classmethod
    def from_hf_config(cls, cfg: dict[str, Any]) -> "DeepseekV1Config":
        base = super().from_hf_config(cfg)
        return replace(
            base,
            partial_rotary_factor=1.0,
            use_qk_norm=False,
            use_qkv_bias=bool(cfg.get("attention_bias", False)),
            scoring_func="softmax",
            topk_method="greedy",
            has_gate_bias=False,
            n_group=1,
            topk_group=1,
            routed_scaling_factor=1.0,
            norm_topk_prob=bool(cfg.get("norm_topk_prob", False)),
        )
