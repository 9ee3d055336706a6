"""Mixtral sparse-MoE: the generic decoder with Mixtral naming/routing.

Reference: vllm/model_executor/models/mixtral.py. Routing is softmax
over all experts -> top-k -> renormalize, which is exactly the decoder's
``norm_topk_prob`` MoE path (models/decoder.py:_moe_mlp grouped GEMM /
parallel/ep.py expert-parallel). HF checkpoint naming differs from
Qwen3-MoE: the router is ``block_sparse_moe.gate`` and experts are
``block_sparse_moe.experts.{e}.w1/w3/w2`` (gate/up/down); the expert
ffn width is the model-level ``intermediate_size``.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import jax.numpy as jnp

from vllm_trianglemix_tpu.models import decoder as _dec
from vllm_trianglemix_tpu.models.decoder import (  # noqa: F401  (re-export)
    DecoderConfig,
    compute_logits,
    forward,
    init_random,
    kv_cache_spec,
    partition_specs,
    shape_tree,
)

_LAYER_MAP = {
    "moe_gate": "model.layers.{i}.block_sparse_moe.gate.weight",
}
_EXPERT_MAP = {
    "gate_proj": "model.layers.{i}.block_sparse_moe.experts.{e}.w1.weight",
    "up_proj": "model.layers.{i}.block_sparse_moe.experts.{e}.w3.weight",
    "down_proj": "model.layers.{i}.block_sparse_moe.experts.{e}.w2.weight",
}


@dataclass(frozen=True)
class MixtralConfig(DecoderConfig):
    use_qk_norm: bool = False
    use_qkv_bias: bool = False
    rope_theta: float = 1_000_000.0
    tie_word_embeddings: bool = False
    eos_token_id: int = 2
    bos_token_id: int = 1
    num_experts: int = 8
    num_experts_per_tok: int = 2
    norm_topk_prob: bool = True

    @classmethod
    def from_hf_config(cls, cfg: dict[str, Any]) -> "MixtralConfig":
        cfg = dict(cfg)
        cfg.setdefault("num_experts", cfg.get("num_local_experts", 8))
        # Mixtral's expert ffn width IS the model intermediate_size.
        cfg.setdefault("moe_intermediate_size", cfg["intermediate_size"])
        cfg.setdefault("norm_topk_prob", True)
        return super().from_hf_config(cfg)


def params_from_hf_state_dict(cfg: DecoderConfig, get_tensor,
                              dtype=jnp.bfloat16, quant=None) -> dict:
    return _dec.params_from_hf_state_dict(
        cfg, get_tensor, dtype=dtype, quant=quant,
        layer_map=_LAYER_MAP, expert_map=_EXPERT_MAP)
