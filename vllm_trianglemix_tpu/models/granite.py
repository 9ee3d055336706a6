"""IBM Granite 3.x dense: Llama with four scalar multipliers.

Reference: vllm/model_executor/models/granite.py — llama plus
``embedding_multiplier`` (scales embeddings), ``residual_multiplier``
(scales every residual branch), ``attention_multiplier`` (replaces the
1/sqrt(head_dim) attention scale), and ``logits_scaling`` (divides the
final logits). All four map onto the shared decoder's generic knobs.
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
class GraniteConfig(DecoderConfig):
    rope_theta: float = 10_000.0
    tie_word_embeddings: bool = True
    eos_token_id: int = 0
    bos_token_id: int = 0

    @classmethod
    def from_hf_config(cls, cfg) -> "GraniteConfig":
        base = super().from_hf_config(cfg)
        return replace(
            base,
            embedding_multiplier=float(cfg.get("embedding_multiplier",
                                               1.0)),
            residual_multiplier=float(cfg.get("residual_multiplier", 1.0)),
            attention_multiplier=(
                float(cfg["attention_multiplier"])
                if cfg.get("attention_multiplier") is not None else None),
            logits_scaling=float(cfg.get("logits_scaling", 1.0)),
            use_qkv_bias=bool(cfg.get("attention_bias", False)),
        )
