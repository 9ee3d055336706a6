"""Generic decoder fallback: serve unknown HF causal-LM architectures.

Role of the reference's TransformersForCausalLM
(vllm/model_executor/models/registry.py:311 + models/transformers.py):
when an architecture string has no explicit registry entry, map its HF
config onto the shared decoder's knobs and serve it — PROVIDED the
config describes a structure the decoder actually implements and the
checkpoint uses the transformers llama-canonical parameter names
(model.layers.{i}.self_attn.q_proj.weight, ...). Anything else fails
loudly at load time with a message naming the unsupported piece; a
silent wrong-math fallback would be worse than no fallback.

Most modern dense decoders (Llama derivatives: Yi, Skywork, ERNIE,
Seed-OSS, Helium, Arcee, ...) are exactly knob combinations: bias flags,
activation, partial rotary, sliding window, tied embeddings, qk-norm.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import jax.numpy as jnp

from vllm_trianglemix_tpu.logger import init_logger
from vllm_trianglemix_tpu.models import decoder
from vllm_trianglemix_tpu.models.decoder import (  # noqa: F401 (re-export)
    DecoderConfig,
    RopeScalingConfig,
    compute_logits,
    forward,
    init_random,
    kv_cache_spec,
    partition_specs,
    shape_tree,
)

logger = init_logger(__name__)


class UnsupportedModelError(ValueError):
    pass


# config keys whose PRESENCE (truthy) signals structure the generic
# decoder does not implement
_REJECT_KEYS = {
    "is_encoder_decoder": "encoder-decoder models",
    "vision_config": "multimodal (vision) models",
    "audio_config": "multimodal (audio) models",
    "num_local_experts": "mixture-of-experts models",
    "n_routed_experts": "mixture-of-experts models",
    "ffn_config": "DBRX-style ffn_config blocks",
    "ssm_cfg": "state-space models",
    "state_size": "state-space models",
    "conv_kernel": "state-space/conv hybrid models",
    "linear_attn_config": "linear-attention hybrids",
    "alibi": "ALiBi position biases",
    "use_alibi": "ALiBi position biases",
    "attn_logit_softcapping": "attention logit softcapping",
    "multi_query": "fused multi-query layouts",
    "new_decoder_architecture": "Falcon fused layouts",
}

_KNOWN_ACTS = ("silu", "gelu", "gelu_new", "gelu_pytorch_tanh", "relu2")


@dataclass(frozen=True)
class AutoDecoderConfig(DecoderConfig):
    tie_word_embeddings: bool = False

    @classmethod
    def from_hf_config(cls, d: dict[str, Any]) -> "AutoDecoderConfig":
        arch = (d.get("architectures") or ["?"])[0]

        def reject(why: str):
            raise UnsupportedModelError(
                f"architecture {arch!r} has no registry entry and the "
                f"generic decoder fallback cannot serve it: {why}. "
                "Add an explicit model module for this family.")

        for key, why in _REJECT_KEYS.items():
            if d.get(key):
                reject(f"config sets {key!r} ({why} are not covered by "
                       "the generic decoder)")
        if d.get("num_experts") or d.get("moe_intermediate_size"):
            reject("config describes a mixture-of-experts model")
        for key in ("vocab_size", "hidden_size", "intermediate_size",
                    "num_hidden_layers", "num_attention_heads"):
            if not d.get(key):
                reject(f"config is missing {key!r}")
        act = d.get("hidden_act", d.get("hidden_activation", "silu"))
        if act not in _KNOWN_ACTS:
            reject(f"unknown hidden_act {act!r}")
        pe_type = d.get("position_embedding_type")
        if pe_type not in (None, "rope", "rotary"):
            reject(f"position_embedding_type {pe_type!r}")
        layer_types = d.get("layer_types")
        sliding = (d.get("sliding_window") or 0
                   if d.get("use_sliding_window", True) else 0)
        if layer_types:
            kinds = set(layer_types)
            if kinds == {"full_attention"}:
                sliding = 0
            elif kinds == {"sliding_attention"} and sliding:
                pass
            else:
                reject(f"heterogeneous layer_types {sorted(kinds)!r}")

        heads = d["num_attention_heads"]
        eos = d.get("eos_token_id", 2)
        if isinstance(eos, list):
            eos = eos[0]
        bias = bool(d.get("attention_bias", d.get("use_bias", False)))
        try:
            rope_scaling = RopeScalingConfig.from_hf(d.get("rope_scaling"))
        except Exception as e:  # noqa: BLE001
            reject(f"rope_scaling not supported ({e})")
        return cls(
            vocab_size=d["vocab_size"],
            hidden_size=d["hidden_size"],
            intermediate_size=d["intermediate_size"],
            num_hidden_layers=d["num_hidden_layers"],
            num_attention_heads=heads,
            num_key_value_heads=d.get("num_key_value_heads") or heads,
            head_dim=d.get("head_dim") or d["hidden_size"] // heads,
            rms_norm_eps=d.get("rms_norm_eps",
                               d.get("layer_norm_eps", 1e-6)),
            rope_theta=d.get("rope_theta", 10_000.0),
            rope_scaling=rope_scaling,
            partial_rotary_factor=d.get("partial_rotary_factor", 1.0),
            hidden_act="gelu_tanh" if act in ("gelu_new",
                                              "gelu_pytorch_tanh") else act,
            use_qk_norm=bool(d.get("use_qk_norm", False)),
            use_qkv_bias=bias,
            use_o_bias=bool(d.get("attention_out_bias", bias)),
            use_mlp_bias=bool(d.get("mlp_bias", False)),
            sliding_window=sliding,
            tie_word_embeddings=d.get("tie_word_embeddings", False),
            max_position_embeddings=d.get("max_position_embeddings", 8192),
            eos_token_id=eos,
            bos_token_id=d.get("bos_token_id") or 1,
        )

    @classmethod
    def from_pretrained(cls, path: str) -> "AutoDecoderConfig":
        import json
        import os

        with open(os.path.join(path, "config.json")) as f:
            return cls.from_hf_config(json.load(f))


def params_from_hf_state_dict(cfg: AutoDecoderConfig, get_tensor,
                              dtype=jnp.bfloat16, quant=None, **kw):
    try:
        return decoder.params_from_hf_state_dict(
            cfg, get_tensor, dtype=dtype, quant=quant, **kw)
    except KeyError as e:
        raise UnsupportedModelError(
            f"generic decoder fallback: checkpoint tensor {e} not found — "
            "the weights do not use transformers llama-canonical names "
            "(model.layers.{i}.self_attn.q_proj.weight, ...). Add an "
            "explicit model module with a name map for this family."
        ) from e
