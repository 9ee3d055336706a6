"""Seed-OSS (ByteDance): Llama-shaped with qkv bias but NO o bias.

Reference: vllm/model_executor/models/seed_oss.py + HF
transformers/models/seed_oss/modeling_seed_oss.py — llama-canonical
names; ``attention_bias`` (qkv) and ``attention_out_bias`` (o) are
independent flags; explicit head_dim.
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
class SeedOssConfig(DecoderConfig):
    rope_theta: float = 10_000.0
    tie_word_embeddings: bool = False
    eos_token_id: int = 2
    bos_token_id: int = 1

    @classmethod
    def from_hf_config(cls, cfg) -> "SeedOssConfig":
        base = super().from_hf_config(cfg)
        return dataclasses.replace(
            base,
            use_qkv_bias=bool(cfg.get("attention_bias", True)),
            use_o_bias=bool(cfg.get("attention_out_bias", False)),
            use_mlp_bias=bool(cfg.get("mlp_bias", False)),
            rms_norm_eps=cfg.get("rms_norm_eps", 1e-6),
            rope_theta=cfg.get("rope_theta", 10_000.0),
        )
