"""ERNIE 4.5 (dense): GLM-style interleaved rope + optional all-bias.

Reference: vllm/model_executor/models/ernie45.py + HF
transformers/models/ernie4_5/modeling_ernie4_5.py — llama-canonical
names but the rotary is INTERLEAVED (rotate-every-two, "glm rope style"
per the HF comment), and ``use_bias`` adds biases to EVERY linear
(q/k/v, o, gate/up/down).
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
class Ernie45Config(DecoderConfig):
    rope_theta: float = 500_000.0
    rope_interleaved: bool = True
    tie_word_embeddings: bool = True
    eos_token_id: int = 2
    bos_token_id: int = 1

    @classmethod
    def from_hf_config(cls, cfg) -> "Ernie45Config":
        base = super().from_hf_config(cfg)
        bias = bool(cfg.get("use_bias", False))
        return dataclasses.replace(
            base,
            use_qkv_bias=bias,
            use_o_bias=bias,
            use_mlp_bias=bias,
            rms_norm_eps=cfg.get("rms_norm_eps", 1e-5),
            tie_word_embeddings=cfg.get("tie_word_embeddings", True),
        )
