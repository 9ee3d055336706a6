"""Cohere2 (Command R7B): Cohere's parallel block + 3:1 sliding/full
with global NoPE layers.

Reference: vllm/model_executor/models/commandr.py (sliding variant) + HF
transformers/models/cohere2/modeling_cohere2.py — the Cohere structure
(parallel attn+MLP over ONE shared LayerNorm, biasless norms, logit
scale, tied embeddings, interleaved rotary) where 3 of every 4 layers
slide; FULL-attention layers skip rotary entirely. Served via
models/hybrid_window.py's period-chunked scan.
"""

from __future__ import annotations

from dataclasses import dataclass

from vllm_trianglemix_tpu.models import hybrid_window as _hw
from vllm_trianglemix_tpu.models.decoder import (  # noqa: F401 (re-export)
    DecoderConfig,
    compute_logits,
    init_random,
    params_from_hf_state_dict,
    partition_specs,
    shape_tree,
)

SUPPORTS_FUSED_DECODE = False

forward = _hw.forward
kv_cache_spec = _hw.kv_cache_spec
kv_cache_group_specs = _hw.kv_cache_group_specs


@dataclass(frozen=True)
class Cohere2Config(DecoderConfig):
    norm_type: str = "layernorm"
    norm_bias: bool = False
    parallel_block: bool = True
    parallel_block_shared_norm: bool = True
    rope_interleaved: bool = True
    tie_word_embeddings: bool = True
    rope_theta: float = 10_000.0
    sliding_window: int = 4096
    layer_types: tuple = ()
    full_attention_rope: str = "none"
    eos_token_id: int = 255001
    bos_token_id: int = 5

    def __post_init__(self):
        if not self.layer_types:
            object.__setattr__(self, "layer_types", tuple(
                "full_attention" if (i + 1) % 4 == 0
                else "sliding_attention"
                for i in range(self.num_hidden_layers)))

    @classmethod
    def from_hf_config(cls, cfg) -> "Cohere2Config":
        d = dict(cfg)
        heads = d["num_attention_heads"]
        kw = dict(
            vocab_size=d["vocab_size"],
            hidden_size=d["hidden_size"],
            intermediate_size=d["intermediate_size"],
            num_hidden_layers=d["num_hidden_layers"],
            num_attention_heads=heads,
            num_key_value_heads=d.get("num_key_value_heads") or heads,
            head_dim=d["hidden_size"] // heads,
            rms_norm_eps=d.get("layer_norm_eps", 1e-5),
            rope_theta=d.get("rope_theta", 10_000.0),
            use_qkv_bias=bool(d.get("attention_bias", False)),
            use_o_bias=bool(d.get("attention_bias", False)),
            logits_scaling=1.0 / d.get("logit_scale", 0.0625),
            sliding_window=d.get("sliding_window") or 0,
            max_position_embeddings=d.get("max_position_embeddings", 8192),
            eos_token_id=d.get("eos_token_id", 255001),
            bos_token_id=d.get("bos_token_id", 5),
        )
        if d.get("layer_types"):
            kw["layer_types"] = tuple(d["layer_types"])
        return cls(**kw)
