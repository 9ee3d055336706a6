"""Qwen3-MoE: the generic decoder with q/k-norm and a sparse-MoE MLP.

Reference: vllm/model_executor/models/qwen3_moe.py (Qwen3 attention +
per-layer 128-expert top-8 MoE). The expert evaluation strategy is the
reference's own TPU fallback (fused_moe/moe_pallas.py dense-eval +
routing mask), see models/decoder.py:_moe_mlp.
"""

from __future__ import annotations

from dataclasses import dataclass

from vllm_trianglemix_tpu.models.decoder import (  # noqa: F401  (re-export)
    DecoderConfig,
    compute_logits,
    forward,
    init_random,
    kv_cache_spec,
    params_from_hf_state_dict,
    partition_specs,
    shape_tree,
)


@dataclass(frozen=True)
class Qwen3MoeConfig(DecoderConfig):
    use_qk_norm: bool = True
    use_qkv_bias: bool = False
    num_experts: int = 128
    num_experts_per_tok: int = 8
    moe_intermediate_size: int = 768
    norm_topk_prob: bool = True
