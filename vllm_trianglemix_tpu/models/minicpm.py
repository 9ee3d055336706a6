"""MiniCPM (dense 1/2-series): Llama layout with muP-style scaling.

Reference: vllm/model_executor/models/minicpm.py — llama-canonical names
plus three scalar schedules that map exactly onto the decoder's Granite
multiplier knobs:

- embeddings scale by ``scale_emb``;
- every residual branch scales by ``scale_depth / sqrt(num_layers)``;
- logits divide by ``hidden_size / dim_model_base``.

MiniCPM-3 (MLA attention) is a different architecture string and is not
served by this module.
"""

from __future__ import annotations

import dataclasses
import math
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
class MiniCPMConfig(DecoderConfig):
    rope_theta: float = 10_000.0
    tie_word_embeddings: bool = False
    eos_token_id: int = 2
    bos_token_id: int = 1

    @classmethod
    def from_hf_config(cls, cfg) -> "MiniCPMConfig":
        if cfg.get("num_experts") or cfg.get("num_experts_per_tok"):
            d = dict(cfg)
            d.setdefault("moe_intermediate_size", d["intermediate_size"])
            cfg = d
        base = super().from_hf_config(cfg)
        L = cfg["num_hidden_layers"]
        return dataclasses.replace(
            base,
            rms_norm_eps=cfg.get("rms_norm_eps", 1e-5),
            rope_theta=cfg.get("rope_theta", 10_000.0),
            tie_word_embeddings=cfg.get("tie_word_embeddings", False),
            embedding_multiplier=cfg.get("scale_emb", 1.0),
            residual_multiplier=(cfg.get("scale_depth", math.sqrt(L))
                                 / math.sqrt(L)),
            logits_scaling=(cfg["hidden_size"]
                            / cfg.get("dim_model_base", cfg["hidden_size"])),
        )
