"""Arcee (AFM-4.5B): Llama-shaped with a NON-gated relu^2 MLP.

Reference: vllm/model_executor/models/arcee.py + HF
transformers/models/arcee/modeling_arcee.py — llama-canonical names but
no gate_proj: mlp = down(relu(up(x))^2), the Nemotron activation on the
StarCoder2 MLP shape.
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
class ArceeConfig(DecoderConfig):
    gated_mlp: bool = False
    hidden_act: str = "relu2"
    rope_theta: float = 10_000.0
    tie_word_embeddings: bool = False
    eos_token_id: int = 2
    bos_token_id: int = 1

    @classmethod
    def from_hf_config(cls, cfg) -> "ArceeConfig":
        base = super().from_hf_config(cfg)
        return dataclasses.replace(
            base,
            use_qkv_bias=bool(cfg.get("attention_bias", False)),
            use_mlp_bias=bool(cfg.get("mlp_bias", False)),
            rms_norm_eps=cfg.get("rms_norm_eps", 1e-5),
            rope_theta=cfg.get("rope_theta", 10_000.0),
            tie_word_embeddings=cfg.get("tie_word_embeddings", False),
        )
