"""Qwen2-MoE (Qwen1.5-MoE-A2.7B family): routed experts + shared expert.

Reference: vllm/model_executor/models/qwen2_moe.py. Qwen2 attention (QKV
biases) + sparse MoE MLP with a SHARED expert whose output is added to
the routed combination behind a per-token sigmoid gate
(Qwen2MoeSparseMoeBlock). Routing softmax-top-k with norm_topk_prob
False by default. The shared decoder's MoE path handles all of it via
``shared_expert_intermediate_size`` / ``use_shared_expert_gate``.
"""

from __future__ import annotations

from dataclasses import dataclass, replace

from vllm_trianglemix_tpu.models.decoder import (  # noqa: F401 (re-export)
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
class Qwen2MoeConfig(DecoderConfig):
    use_qkv_bias: bool = True
    tie_word_embeddings: bool = False
    eos_token_id: int = 151645
    bos_token_id: int = 151643

    @classmethod
    def from_hf_config(cls, cfg) -> "Qwen2MoeConfig":
        if cfg.get("mlp_only_layers"):
            raise ValueError("Qwen2-MoE mlp_only_layers is not supported")
        if cfg.get("decoder_sparse_step", 1) != 1:
            raise ValueError("Qwen2-MoE decoder_sparse_step != 1 is not "
                             "supported")
        base = super().from_hf_config(cfg)
        return replace(
            base,
            use_qkv_bias=True,
            norm_topk_prob=cfg.get("norm_topk_prob", False),
            shared_expert_intermediate_size=cfg.get(
                "shared_expert_intermediate_size", 0),
            use_shared_expert_gate=True,
        )
