"""Cohere Command-R: parallel shared-norm block, bias-free LayerNorm,
interleaved rope, scaled logits.

Reference: vllm/model_executor/models/commandr.py + HF
transformers/models/cohere/modeling_cohere.py — ONE bias-free LayerNorm
feeds both attention and the MLP (x + attn(h) + mlp(h)), GPT-J-style
interleaved (rotate-every-two) full rotary, gated SiLU MLP, embeddings
ALWAYS tied, and final logits multiplied by ``logit_scale`` (expressed
here through the decoder's divisor knob as 1/logit_scale).
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
class CohereConfig(DecoderConfig):
    norm_type: str = "layernorm"
    norm_bias: bool = False
    parallel_block: bool = True
    parallel_block_shared_norm: bool = True
    rope_interleaved: bool = True
    tie_word_embeddings: bool = True
    rope_theta: float = 10_000.0
    eos_token_id: int = 255001
    bos_token_id: int = 5

    @classmethod
    def from_hf_config(cls, cfg) -> "CohereConfig":
        d = dict(cfg)
        if d.get("use_qk_norm", False):
            raise ValueError("Cohere use_qk_norm (per-head LayerNorm) "
                             "checkpoints are not supported yet")
        heads = d["num_attention_heads"]
        return cls(
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
            max_position_embeddings=d.get("max_position_embeddings", 8192),
            eos_token_id=d.get("eos_token_id", 255001),
            bos_token_id=d.get("bos_token_id", 5),
        )


def params_from_hf_state_dict(cfg: CohereConfig, get_tensor,
                              dtype=jnp.bfloat16, quant=None, **kw):
    return decoder.params_from_hf_state_dict(
        cfg, get_tensor, dtype=dtype, quant=quant, **kw)
