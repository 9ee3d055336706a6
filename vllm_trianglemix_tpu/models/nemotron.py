"""Nemotron (Minitron / Nemotron-4): LayerNorm1P + ReLU² MLP.

Reference: vllm/model_executor/models/nemotron.py + HF
transformers/models/nemotron/modeling_nemotron.py — zero-centered
LayerNorm1P ((1 + w) weight, biased), non-gated ReLU-squared MLP
(up_proj -> relu² -> down_proj), partial rotary, untied lm_head, no
attention bias. Config uses ``norm_eps`` and defaults
partial_rotary_factor=0.5.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp

from vllm_trianglemix_tpu.models import decoder
from vllm_trianglemix_tpu.models.decoder import (  # noqa: F401 (re-export)
    DecoderConfig,
    compute_logits,
    forward,
    init_random,
    kv_cache_spec,
    partition_specs,
    shape_tree,
)


@dataclass(frozen=True)
class NemotronConfig(DecoderConfig):
    norm_type: str = "layernorm1p"
    gated_mlp: bool = False
    hidden_act: str = "relu2"
    partial_rotary_factor: float = 0.5
    tie_word_embeddings: bool = False
    rope_theta: float = 10_000.0
    eos_token_id: int = 3
    bos_token_id: int = 2

    @classmethod
    def from_hf_config(cls, cfg) -> "NemotronConfig":
        d = dict(cfg)
        heads = d["num_attention_heads"]
        return cls(
            vocab_size=d["vocab_size"],
            hidden_size=d["hidden_size"],
            intermediate_size=d["intermediate_size"],
            num_hidden_layers=d["num_hidden_layers"],
            num_attention_heads=heads,
            num_key_value_heads=d.get("num_key_value_heads") or heads,
            head_dim=d.get("head_dim") or d["hidden_size"] // heads,
            rms_norm_eps=d.get("norm_eps", 1e-5),
            rope_theta=d.get("rope_theta", 10_000.0),
            partial_rotary_factor=d.get("partial_rotary_factor", 0.5),
            use_qkv_bias=bool(d.get("attention_bias", False)),
            use_o_bias=bool(d.get("attention_bias", False)),
            use_mlp_bias=bool(d.get("mlp_bias", False)),
            max_position_embeddings=d.get("max_position_embeddings", 4096),
            tie_word_embeddings=d.get("tie_word_embeddings", False),
            eos_token_id=d.get("eos_token_id", 3),
            bos_token_id=d.get("bos_token_id", 2),
        )


def params_from_hf_state_dict(cfg: NemotronConfig, get_tensor,
                              dtype=jnp.bfloat16, quant=None, **kw):
    return decoder.params_from_hf_state_dict(
        cfg, get_tensor, dtype=dtype, quant=quant, **kw)
