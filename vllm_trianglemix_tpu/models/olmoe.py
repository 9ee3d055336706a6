"""OLMoE (OlmoeForCausalLM): sparse-MoE decoder with flat q/k RMSNorm.

Reference: vllm/model_executor/models/olmoe.py + HF
transformers/models/olmoe/modeling_olmoe.py — llama-canonical pre-norm
blocks; q/k RMSNorm over the FLAT projection before the head split
(OLMo-2's layout); softmax top-k routing WITHOUT weight renorm
(norm_topk_prob=False default); per-expert gate/up/down at the standard
``mlp.experts.{e}`` names, router at ``mlp.gate`` — all generic-decoder
knobs and default weight names, no shims.
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
class OlmoeConfig(DecoderConfig):
    use_qk_norm: bool = True
    qk_norm_flat: bool = True
    rope_theta: float = 10_000.0
    tie_word_embeddings: bool = False
    num_experts: int = 64
    num_experts_per_tok: int = 8
    norm_topk_prob: bool = False
    eos_token_id: int = 50279
    bos_token_id: int = 50279

    @classmethod
    def from_hf_config(cls, cfg) -> "OlmoeConfig":
        base = super().from_hf_config(cfg)
        return replace(
            base,
            use_qk_norm=True,
            qk_norm_flat=True,
            rms_norm_eps=cfg.get("rms_norm_eps", 1e-5),
            rope_theta=cfg.get("rope_theta", 10_000.0),
            # HF OlmoeConfig defaults norm_topk_prob FALSE (the base
            # decoder intake assumes the Qwen-style True default).
            norm_topk_prob=bool(cfg.get("norm_topk_prob", False)),
            moe_intermediate_size=cfg.get("intermediate_size", 0),
        )
