"""Helium (Kyutai helium-1): Llama-shaped, 100k rope, tight norm eps.

Reference: HF transformers/models/helium/modeling_helium.py (vllm serves
it via the transformers fallback) — llama-canonical names and knobs.
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
class HeliumConfig(DecoderConfig):
    rope_interleaved: bool = True  # HF rotate_half is rotate-every-two
    rope_theta: float = 100_000.0
    tie_word_embeddings: bool = False
    eos_token_id: int = 2
    bos_token_id: int = 1

    @classmethod
    def from_hf_config(cls, cfg) -> "HeliumConfig":
        base = super().from_hf_config(cfg)
        return dataclasses.replace(
            base,
            use_qkv_bias=bool(cfg.get("attention_bias", False)),
            use_mlp_bias=bool(cfg.get("mlp_bias", False)),
            rms_norm_eps=cfg.get("rms_norm_eps", 1e-8),
            rope_theta=cfg.get("rope_theta", 100_000.0),
            tie_word_embeddings=cfg.get("tie_word_embeddings", False),
        )
