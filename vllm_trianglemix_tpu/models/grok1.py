"""Grok-1 (Grok1ModelForCausalLM, xAI 314B 8x-MoE).

Reference: vllm/model_executor/models/grok1.py. The shared decoder with:

- SANDWICH norms: pre_attn_norm / post_attn_norm around attention and
  pre_moe_norm / post_moe_norm around the MoE block (grok1.py:247-254 —
  the decoder's sandwich_norm knob under Grok's names);
- attention-logit soft cap 30*tanh(x/30) (attn_logit_softcapping,
  grok1.py:80-89) and ROUTER-logit soft cap 30*tanh(x/30) before the
  renormalized softmax top-2 (grok1.py:109, router_logit_softcapping);
- muP-style constants: embedding_multiplier_scale on the embeddings,
  attn_output_multiplier FOLDED into o_proj at load, logits scaled by
  output_multiplier_scale (grok1.py:57-59 defaults when the config
  omits them);
- expert weights stored as ``moe_block.experts.{e}.linear`` (gate) /
  ``linear_v`` (up) / ``linear_1`` (down) (grok1.py:366-370), the
  router at ``moe_block.gate``, attention under ``.attn.``, and norms
  that may spell ``.scale`` instead of ``.weight`` (grok1.py:451-453).
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import Any

import jax.numpy as jnp
import numpy as np

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

_DEF_ATTN_OUT_MULT = 0.08838834764831845
_DEF_OUTPUT_MULT = 0.5773502691896257
_DEF_EMBEDDING_MULT = 78.38367176906169


@dataclass(frozen=True)
class Grok1Config(DecoderConfig):
    sandwich_norm: bool = True
    attn_soft_cap: float = 30.0
    router_logit_softcapping: float = 30.0
    embedding_multiplier: float = _DEF_EMBEDDING_MULT
    logits_scaling: float = 1.0 / _DEF_OUTPUT_MULT
    attn_output_multiplier: float = _DEF_ATTN_OUT_MULT
    norm_topk_prob: bool = True
    rope_theta: float = 10_000.0
    tie_word_embeddings: bool = True
    eos_token_id: int = 2
    bos_token_id: int = 1

    @classmethod
    def from_hf_config(cls, cfg: dict[str, Any]) -> "Grok1Config":
        from dataclasses import replace

        base = super().from_hf_config(cfg)
        return replace(
            base,
            sandwich_norm=True,
            norm_topk_prob=True,
            attn_soft_cap=max(
                cfg.get("attn_logit_softcapping", 30.0) or 0.0, 0.0),
            router_logit_softcapping=30.0,
            embedding_multiplier=cfg.get("embedding_multiplier_scale",
                                         _DEF_EMBEDDING_MULT),
            logits_scaling=1.0 / cfg.get("output_multiplier_scale",
                                         _DEF_OUTPUT_MULT),
            attn_output_multiplier=cfg.get("attn_output_multiplier",
                                           _DEF_ATTN_OUT_MULT),
            rms_norm_eps=cfg.get("rms_norm_eps", 1e-5),
            rope_theta=cfg.get("rope_theta", 10_000.0),
            tie_word_embeddings=cfg.get("tie_word_embeddings", True),
        )


_NORM_RENAMES = {
    "input_layernorm": "pre_attn_norm",
    "post_self_attn_layernorm": "post_attn_norm",
    "post_attention_layernorm": "pre_moe_norm",
    "post_mlp_layernorm": "post_moe_norm",
}
_EXPERT_RX = re.compile(
    r"model\.layers\.(\d+)\.mlp\.experts\.(\d+)\.(gate|up|down)_proj"
    r"\.weight")
_EXPERT_NAME = {"gate": "linear", "up": "linear_v", "down": "linear_1"}


def _shim(cfg: Grok1Config, get_tensor):

    def fetch(name: str):
        try:
            return get_tensor(name)
        except KeyError:
            if name.endswith(".weight"):
                # Grok1-specific norm.scale naming (grok1.py:451-453)
                return get_tensor(name[:-len(".weight")] + ".scale")
            raise

    def shim(name: str):
        m = _EXPERT_RX.fullmatch(name)
        if m:
            return fetch(
                f"model.layers.{m.group(1)}.moe_block.experts."
                f"{m.group(2)}.{_EXPERT_NAME[m.group(3)]}.weight")
        m2 = re.fullmatch(r"model\.layers\.(\d+)\.(.+)", name)
        if m2:
            rest = m2.group(2)
            for ours, theirs in _NORM_RENAMES.items():
                rest = rest.replace(f"{ours}.", f"{theirs}.")
            rest = (rest
                    .replace("self_attn.", "attn.")
                    .replace("mlp.gate.weight", "moe_block.gate.weight"))
            w = np.asarray(fetch(f"model.layers.{m2.group(1)}.{rest}"))
            if rest == "attn.o_proj.weight":
                # fold attn_output_multiplier (grok1.py:199)
                w = w * cfg.attn_output_multiplier
            return w
        return fetch(name)

    return shim


def params_from_hf_state_dict(cfg: Grok1Config, get_tensor,
                              dtype=jnp.bfloat16, quant=None, **kw):
    if quant is not None:
        raise ValueError("quantized Grok-1 checkpoints are not supported")
    return _dec.params_from_hf_state_dict(
        cfg, _shim(cfg, get_tensor), dtype=dtype,
        layer_map={"moe_gate": "model.layers.{i}.mlp.gate.weight"},
        expert_map=None)
