"""HunYuan dense v1 (Tencent): Llama-shaped with per-head qk-norm.

Reference: vllm/model_executor/models/hunyuan_v1.py + HF
transformers/models/hunyuan_v1_dense/ — llama-canonical names except the
qk norms spell ``query_layernorm`` / ``key_layernorm`` (per-head RMSNorm
over head_dim, the decoder's standard use_qk_norm mode). Cross-layer
attention (use_cla) variants are rejected.
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
    "q_norm": "model.layers.{i}.self_attn.query_layernorm.weight",
    "k_norm": "model.layers.{i}.self_attn.key_layernorm.weight",
}


@dataclass(frozen=True)
class HunYuanDenseConfig(DecoderConfig):
    use_qk_norm: bool = True
    rope_theta: float = 10_000.0
    tie_word_embeddings: bool = False
    eos_token_id: int = 2
    bos_token_id: int = 1

    @classmethod
    def from_hf_config(cls, cfg) -> "HunYuanDenseConfig":
        if cfg.get("use_cla"):
            raise ValueError("HunYuan cross-layer attention (use_cla) "
                             "is not supported yet")
        d = dict(cfg)
        if d.get("attention_head_dim"):
            d.setdefault("head_dim", d["attention_head_dim"])
        base = super().from_hf_config(d)
        return dataclasses.replace(
            base,
            use_qkv_bias=bool(d.get("attention_bias", False)),
            rms_norm_eps=d.get("rms_norm_eps", 1e-5),
            rope_theta=d.get("rope_theta", 10_000.0),
            tie_word_embeddings=d.get("tie_word_embeddings", False),
        )


@dataclass(frozen=True)
class HunYuanMoEConfig(HunYuanDenseConfig):
    """HunYuan-A13B/A52B MoE (HunYuanMoEV1ForCausalLM).

    Reference: hunyuan_v1.py HunYuanSparseMoeBlock — softmax top-k
    routing (renormalized when top_k > 1, :409), plus an UNGATED shared
    MLP of width ``intermediate_size * num_shared_expert`` added to the
    routed output (:421-437) — the decoder's shared-expert knob with
    use_shared_expert_gate=False. Per-layer list-valued ``moe_topk`` /
    ``num_experts`` / ``num_shared_expert`` variants are rejected.
    """

    @classmethod
    def from_hf_config(cls, cfg) -> "HunYuanMoEConfig":
        d = dict(cfg)
        for key in ("num_experts", "moe_topk", "num_shared_expert",
                    "moe_intermediate_size"):
            if isinstance(d.get(key), list):
                vals = set(d[key])
                if len(vals) != 1:
                    raise ValueError(
                        f"heterogeneous per-layer {key} lists are not "
                        "supported")
                d[key] = d[key][0]
        base = super().from_hf_config(d)
        topk = int(d.get("moe_topk", 1))
        shared = (int(d.get("num_shared_expert", 1))
                  * d["intermediate_size"]
                  if d.get("use_mixed_mlp_moe", 0) else 0)
        return dataclasses.replace(
            base,
            num_experts=int(d["num_experts"]),
            num_experts_per_tok=topk,
            moe_intermediate_size=(d.get("moe_intermediate_size")
                                   or d["intermediate_size"]),
            norm_topk_prob=topk > 1,
            shared_expert_intermediate_size=shared,
            use_shared_expert_gate=False,
        )


_MOE_LAYER_MAP = dict(
    _LAYER_MAP,
    moe_gate="model.layers.{i}.mlp.gate.wg.weight",
    shared_gate_proj=(
        "model.layers.{i}.mlp.shared_mlp.gate_proj.weight"),
    shared_up_proj="model.layers.{i}.mlp.shared_mlp.up_proj.weight",
    shared_down_proj="model.layers.{i}.mlp.shared_mlp.down_proj.weight",
)


def params_from_hf_state_dict(cfg: HunYuanDenseConfig, get_tensor,
                              dtype=jnp.bfloat16, quant=None, **kw):
    if isinstance(cfg, HunYuanMoEConfig):
        if quant is not None:
            raise ValueError("quantized HunYuan-MoE checkpoints are not "
                             "supported")
        return _dec.params_from_hf_state_dict(
            cfg, get_tensor, dtype=dtype, layer_map=_MOE_LAYER_MAP)
    return _dec.params_from_hf_state_dict(
        cfg, get_tensor, dtype=dtype, quant=quant, layer_map=_LAYER_MAP)
