"""Granite 3.x MoE (GraniteMoeForCausalLM): Granite multipliers + fused
expert stacks.

Reference: vllm/model_executor/models/granitemoe.py + HF
transformers/models/granitemoe/modeling_granitemoe.py — the Granite
scalar multipliers (embedding/residual/attention/logits) on a sparse-MoE
decoder whose checkpoint fuses the experts:

- ``block_sparse_moe.input_linear.weight``  [E, 2*I, D] — rows 0:I gate,
  I:2I up;
- ``block_sparse_moe.output_linear.weight`` [E, D, I] — down;
- ``block_sparse_moe.router.layer.weight``  [E, D].

Routing is top-k then softmax over the selected logits, which equals the
decoder's softmax->top-k->renorm (norm_topk_prob) path exactly.
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

_LAYER_MAP = {
    "moe_gate": "model.layers.{i}.block_sparse_moe.router.layer.weight",
}
_EXPERT_RX = re.compile(
    r"model\.layers\.(\d+)\.mlp\.experts\.(\d+)\.(gate|up|down)_proj"
    r"\.weight")


@dataclass(frozen=True)
class GraniteMoeConfig(DecoderConfig):
    tie_word_embeddings: bool = True
    rope_theta: float = 10_000.0
    eos_token_id: int = 0
    bos_token_id: int = 0

    @classmethod
    def from_hf_config(cls, cfg: dict[str, Any]) -> "GraniteMoeConfig":
        import dataclasses

        d = dict(cfg)
        d.setdefault("num_experts", d.get("num_local_experts", 8))
        d.setdefault("moe_intermediate_size", d["intermediate_size"])
        base = super().from_hf_config(d)
        return dataclasses.replace(
            base,
            rms_norm_eps=d.get("rms_norm_eps", 1e-6),
            embedding_multiplier=d.get("embedding_multiplier", 1.0),
            residual_multiplier=d.get("residual_multiplier", 1.0),
            attention_multiplier=d.get("attention_multiplier"),
            logits_scaling=d.get("logits_scaling", 1.0),
            use_qkv_bias=bool(d.get("attention_bias", False)),
        )


@dataclass(frozen=True)
class GraniteMoeSharedConfig(GraniteMoeConfig):
    """GraniteMoeShared (Granite 3.1+): the MoE block plus one dense
    shared MLP added to every token's routed output (reference
    granitemoeshared.py), stored fused like the experts:
    shared_mlp.input_linear [2*Is, D] (gate/up halves) +
    shared_mlp.output_linear [D, Is]."""

    @classmethod
    def from_hf_config(cls, cfg):
        import dataclasses

        base = super().from_hf_config(cfg)
        return dataclasses.replace(
            base,
            shared_expert_intermediate_size=cfg.get(
                "shared_intermediate_size", 0),
        )


_SHARED_RX = re.compile(
    r"model\.layers\.(\d+)\.mlp\.shared_expert\.(gate|up|down)_proj"
    r"\.weight")


def _shim(cfg: GraniteMoeConfig, get_tensor):
    inter = cfg.moe_intermediate_size
    shared_i = cfg.shared_expert_intermediate_size

    def shim(name: str):
        m = _SHARED_RX.fullmatch(name)
        if m:
            i, which = m.group(1), m.group(2)
            if which == "down":
                return np.asarray(get_tensor(
                    f"model.layers.{i}.shared_mlp.output_linear.weight"))
            w = np.asarray(get_tensor(
                f"model.layers.{i}.shared_mlp.input_linear.weight"))
            return w[:shared_i] if which == "gate" else w[shared_i:]
        m = _EXPERT_RX.fullmatch(name)
        if m:
            i, e, which = m.group(1), int(m.group(2)), m.group(3)
            if which == "down":
                w = np.asarray(get_tensor(
                    f"model.layers.{i}.block_sparse_moe.output_linear"
                    ".weight"))[e]          # [D, I] -> transposed upstream
                return w
            w = np.asarray(get_tensor(
                f"model.layers.{i}.block_sparse_moe.input_linear"
                ".weight"))[e]              # [2I, D]
            return w[:inter] if which == "gate" else w[inter:]
        return get_tensor(name)

    return shim


def params_from_hf_state_dict(cfg: GraniteMoeConfig, get_tensor,
                              dtype=jnp.bfloat16, quant=None, **kw):
    if quant is not None:
        raise ValueError("quantized GraniteMoe checkpoints (fused expert "
                         "layouts) are not supported yet")
    return _dec.params_from_hf_state_dict(
        cfg, _shim(cfg, get_tensor), dtype=dtype,
        layer_map=_LAYER_MAP)
