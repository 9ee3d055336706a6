"""Orion (OrionStarAI Orion-14B): Llama layout with biased LayerNorms.

Reference: vllm/model_executor/models/orion.py — llama-canonical names
and geometry, but every norm is nn.LayerNorm (weight + bias; the config
still calls its epsilon ``rms_norm_eps``).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass

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
class OrionConfig(DecoderConfig):
    norm_type: str = "layernorm"
    rope_theta: float = 10_000.0
    tie_word_embeddings: bool = False
    eos_token_id: int = 2
    bos_token_id: int = 1

    @classmethod
    def from_hf_config(cls, cfg) -> "OrionConfig":
        base = super().from_hf_config(cfg)
        return dataclasses.replace(
            base,
            rms_norm_eps=cfg.get("rms_norm_eps", 1e-5),
            rope_theta=cfg.get("rope_theta", 10_000.0),
            tie_word_embeddings=cfg.get("tie_word_embeddings", False),
        )
