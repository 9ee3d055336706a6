"""InternLM v1 + Xverse: Llama-canonical aliases with a bias flag.

Reference: vllm registry maps XverseForCausalLM straight onto llama
(registry.py) and InternLMForCausalLM onto llama-with-bias
(internlm.py) — both checkpoints use llama-canonical names; the only
knob is InternLM's ``bias`` (qkv + o biases).
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
class InternLMConfig(DecoderConfig):
    rope_theta: float = 10_000.0
    tie_word_embeddings: bool = False
    eos_token_id: int = 2
    bos_token_id: int = 1

    @classmethod
    def from_hf_config(cls, cfg) -> "InternLMConfig":
        base = super().from_hf_config(cfg)
        bias = bool(cfg.get("bias", False))
        return dataclasses.replace(
            base,
            use_qkv_bias=bias,
            use_o_bias=bias,
            rms_norm_eps=cfg.get("rms_norm_eps", 1e-6),
            rope_theta=cfg.get("rope_theta", 10_000.0),
            tie_word_embeddings=cfg.get("tie_word_embeddings", False),
        )


@dataclass(frozen=True)
class XverseConfig(InternLMConfig):
    pass
