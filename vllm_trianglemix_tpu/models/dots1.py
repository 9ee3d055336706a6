"""dots.llm1 (Dots1ForCausalLM): qk-norm attention + DeepSeek-V3-style
routed experts (rednote-hilab dots.llm1 142B-A14B).

Reference: vllm/model_executor/models/dots1.py + HF
transformers/models/dots1/modeling_dots1.py. Structurally the
GLM-4.5-MoE two-stack shape (models/glm4_moe.py) with:

- FULL rotate-half rotary (GLM-MoE rotates half the head);
- per-head q/k RMSNorm always on (Dots1Attention q_norm/k_norm);
- ``attention_bias`` covers o_proj too;
- the same DeepSeek-V3 router: sigmoid scores + e_score_correction_bias
  group-top-k selection, renorm, routed_scaling_factor, always-on
  shared experts — deepseek_v2._routed_moe via the glm4_moe stacks.
"""

from __future__ import annotations

from dataclasses import dataclass, replace
from typing import Any

from vllm_trianglemix_tpu.models.glm4_moe import (  # noqa: F401 (re-export)
    Glm4MoeConfig,
    SUPPORTS_FUSED_DECODE,
    compute_logits,
    forward,
    init_random,
    kv_cache_spec,
    params_from_hf_state_dict,
    partition_specs,
    shape_tree,
)


@dataclass(frozen=True)
class Dots1Config(Glm4MoeConfig):
    partial_rotary_factor: float = 1.0
    use_qk_norm: bool = True
    first_k_dense_replace: int = 0
    eos_token_id: int = 151643
    bos_token_id: int = 151643

    @classmethod
    def from_hf_config(cls, cfg: dict[str, Any]) -> "Dots1Config":
        d = dict(cfg)
        layer_types = d.get("layer_types") or []
        if any(t == "sliding_attention" for t in layer_types):
            raise ValueError("dots.llm1 sliding_attention layer_types are "
                             "not supported (published checkpoints use "
                             "full attention on every layer)")
        d.setdefault("partial_rotary_factor", 1.0)
        base = super().from_hf_config(d)
        bias = bool(d.get("attention_bias", False))
        return replace(
            base,
            use_qk_norm=True,
            use_o_bias=bias,
            rms_norm_eps=d.get("rms_norm_eps", 1e-6),
            first_k_dense_replace=d.get("first_k_dense_replace", 0),
            norm_topk_prob=d.get("norm_topk_prob", False),
            eos_token_id=d.get("eos_token_id") or 151643,
            bos_token_id=d.get("bos_token_id") or 151643,
        )
