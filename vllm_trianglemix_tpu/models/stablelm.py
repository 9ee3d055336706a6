"""StableLM (stablelm-2 / stablelm-zephyr): partial rotary + LayerNorm.

Reference: vllm/model_executor/models/stablelm.py + HF
transformers/models/stablelm/modeling_stablelm.py — Llama-shaped GQA
decoder with LayerNorm (biased) norms, rotary over
partial_rotary_factor of head_dim, optional qkv bias
(use_qkv_bias), gated SiLU MLP, untied lm_head. Names are Llama
canonical, so no shim is needed.
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
class StableLmConfig(DecoderConfig):
    norm_type: str = "layernorm"
    partial_rotary_factor: float = 0.25
    tie_word_embeddings: bool = False
    rope_theta: float = 10_000.0
    eos_token_id: int = 0
    bos_token_id: int = 0

    @classmethod
    def from_hf_config(cls, cfg) -> "StableLmConfig":
        d = dict(cfg)
        if d.get("use_parallel_residual", False):
            raise ValueError("StableLM use_parallel_residual checkpoints "
                             "are not supported yet")
        if d.get("qk_layernorm", False):
            raise ValueError("StableLM qk_layernorm checkpoints are not "
                             "supported yet")
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
            partial_rotary_factor=d.get("partial_rotary_factor", 0.25),
            use_qkv_bias=bool(d.get("use_qkv_bias", False)),
            max_position_embeddings=d.get("max_position_embeddings", 4096),
            tie_word_embeddings=d.get("tie_word_embeddings", False),
            eos_token_id=d.get("eos_token_id") or 0,
            bos_token_id=d.get("bos_token_id") or 0,
        )


def params_from_hf_state_dict(cfg: StableLmConfig, get_tensor,
                              dtype=jnp.bfloat16, quant=None, **kw):
    return decoder.params_from_hf_state_dict(
        cfg, get_tensor, dtype=dtype, quant=quant, **kw)
