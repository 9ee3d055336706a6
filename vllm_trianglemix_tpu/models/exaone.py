"""EXAONE 3.x (LG AI, ExaoneForCausalLM): GPT-naming over a llama body.

Reference: vllm/model_executor/models/exaone.py — a llama-shaped RMSNorm
GQA decoder whose checkpoint uses GPT-style names:

- ``transformer.wte.weight`` (embeddings), ``transformer.ln_f.weight``
- ``transformer.h.{i}.ln_1`` / ``ln_2`` (input / post norms)
- ``transformer.h.{i}.attn.attention.{q,k,v}_proj`` + ``out_proj``
- ``transformer.h.{i}.mlp.c_fc_0`` (gate) / ``c_fc_1`` (up) /
  ``c_proj`` (down)

Config spells layer count ``num_layers`` and the activation
``activation_function``.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass

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
    "input_layernorm": "transformer.h.{i}.ln_1.weight",
    "post_attention_layernorm": "transformer.h.{i}.ln_2.weight",
    "q_proj": "transformer.h.{i}.attn.attention.q_proj.weight",
    "k_proj": "transformer.h.{i}.attn.attention.k_proj.weight",
    "v_proj": "transformer.h.{i}.attn.attention.v_proj.weight",
    "o_proj": "transformer.h.{i}.attn.attention.out_proj.weight",
    "gate_proj": "transformer.h.{i}.mlp.c_fc_0.weight",
    "up_proj": "transformer.h.{i}.mlp.c_fc_1.weight",
    "down_proj": "transformer.h.{i}.mlp.c_proj.weight",
}
_TOP_MAP = {
    "model.embed_tokens.weight": "transformer.wte.weight",
    "model.norm.weight": "transformer.ln_f.weight",
}


@dataclass(frozen=True)
class ExaoneConfig(DecoderConfig):
    rope_theta: float = 500_000.0
    tie_word_embeddings: bool = True
    eos_token_id: int = 361
    bos_token_id: int = 1

    @classmethod
    def from_hf_config(cls, cfg) -> "ExaoneConfig":
        d = dict(cfg)
        d.setdefault("num_hidden_layers", d.get("num_layers"))
        act = d.get("activation_function", "silu")
        if act not in ("silu",):
            raise ValueError(f"EXAONE activation {act!r} not supported")
        base = super().from_hf_config(d)
        return dataclasses.replace(
            base,
            rms_norm_eps=d.get("layer_norm_epsilon", 1e-5),
            rope_theta=d.get("rope_theta", 500_000.0),
            tie_word_embeddings=d.get("tie_word_embeddings", True),
        )


def _shim(get_tensor):
    def shim(name: str):
        return get_tensor(_TOP_MAP.get(name, name))

    return shim


def params_from_hf_state_dict(cfg: ExaoneConfig, get_tensor,
                              dtype=jnp.bfloat16, quant=None, **kw):
    return _dec.params_from_hf_state_dict(
        cfg, _shim(get_tensor), dtype=dtype, quant=quant,
        layer_map=_LAYER_MAP)
