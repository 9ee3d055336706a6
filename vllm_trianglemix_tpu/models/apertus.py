"""Apertus (ApertusForCausalLM): non-gated xIELU MLP + qk-norm llama
variant (Swiss AI 8B/70B).

Reference: vllm/model_executor/models/apertus.py + HF
transformers/models/apertus/modeling_apertus.py. Structure:

- llama backbone with per-head q/k RMSNorm BEFORE rope (Qwen3-style);
- NON-gated MLP ``down(xielu(up(x)))`` where xIELU carries per-layer
  learnable ``mlp.act_fn.alpha_p`` / ``alpha_n`` scalars (decoder.py
  hidden_act="xielu" knob);
- norms named ``attention_layernorm`` / ``feedforward_layernorm``;
- ``attention_bias`` puts biases on q/k/v AND o;
- llama3-style rope scaling by default (theta 12M).
"""

from __future__ import annotations

from dataclasses import dataclass, replace
from typing import Any

import jax.numpy as jnp

from vllm_trianglemix_tpu.models import decoder as _dec
from vllm_trianglemix_tpu.models.decoder import (  # noqa: F401 (re-export)
    DecoderConfig,
    compute_logits,
    forward,
    init_random,
    kv_cache_spec,
    partition_specs,
    shape_tree,
)

_LAYER_MAP = {
    "input_layernorm": "model.layers.{i}.attention_layernorm.weight",
    "post_attention_layernorm":
        "model.layers.{i}.feedforward_layernorm.weight",
}


@dataclass(frozen=True)
class ApertusConfig(DecoderConfig):
    gated_mlp: bool = False
    hidden_act: str = "xielu"
    use_qk_norm: bool = True
    rope_theta: float = 12_000_000.0
    tie_word_embeddings: bool = False
    eos_token_id: int = 2
    bos_token_id: int = 1

    @classmethod
    def from_hf_config(cls, cfg: dict[str, Any]) -> "ApertusConfig":
        base = super().from_hf_config(cfg)
        if cfg.get("hidden_act", "xielu") != "xielu":
            raise ValueError("Apertus checkpoints with hidden_act != "
                             "'xielu' are not supported")
        bias = bool(cfg.get("attention_bias", False))
        return replace(
            base,
            rms_norm_eps=cfg.get("rms_norm_eps", 1e-5),
            rope_theta=cfg.get("rope_theta", 12_000_000.0),
            use_qkv_bias=bias,
            use_o_bias=bias,
            tie_word_embeddings=cfg.get("tie_word_embeddings", False),
            eos_token_id=cfg.get("eos_token_id") or 2,
            bos_token_id=cfg.get("bos_token_id") or 1,
        )


def params_from_hf_state_dict(cfg: ApertusConfig, get_tensor,
                              dtype=jnp.bfloat16, quant=None, **kw):
    return _dec.params_from_hf_state_dict(cfg, get_tensor, dtype=dtype,
                                          quant=quant,
                                          layer_map=_LAYER_MAP)
