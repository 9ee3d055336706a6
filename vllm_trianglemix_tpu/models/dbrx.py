"""DBRX (Databricks MoE): fused Wqkv + flat expert tensors + clip_qkv.

Reference: vllm/model_executor/models/dbrx.py + HF
transformers/models/dbrx/modeling_dbrx.py — 16-expert top-4 MoE with:

- nested config: geometry in d_model/n_heads/n_layers; attn_config
  carries kv_n_heads/clip_qkv/rope_theta; ffn_config carries
  ffn_hidden_size/moe_num_experts/moe_top_k;
- ``transformer.blocks.{i}`` naming: norm_attn_norm.norm_1/norm_2 are
  the pre/post-attention LayerNorms (weight-only, no bias),
  attn.Wqkv.weight is the fused q/k/v projection (clamped to
  [-clip_qkv, clip_qkv] after the matmul — the decoder's qkv_clip knob),
  out_proj is o_proj;
- experts stored FLAT: ffn.experts.mlp.w1/v1/w2 are [E*I, D] with
  expert e in rows e*I:(e+1)*I (w1 gate, v1 up, w2 down — w2 chunks
  multiply as x @ w2[e], so they load untransposed);
- router ffn.router.layer.weight; softmax -> top-k -> L1 renorm
  (moe_normalize_expert_weights=1) == the decoder's norm_topk_prob path.
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
    "input_layernorm":
        "transformer.blocks.{i}.norm_attn_norm.norm_1.weight",
    "post_attention_layernorm":
        "transformer.blocks.{i}.norm_attn_norm.norm_2.weight",
    "o_proj": "transformer.blocks.{i}.norm_attn_norm.attn.out_proj.weight",
    "moe_gate": "transformer.blocks.{i}.ffn.router.layer.weight",
}
_TOP_MAP = {
    "model.embed_tokens.weight": "transformer.wte.weight",
    "model.norm.weight": "transformer.norm_f.weight",
}
_QKV_RX = re.compile(
    r"model\.layers\.(\d+)\.self_attn\.([qkv])_proj\.weight")
_EXPERT_RX = re.compile(
    r"model\.layers\.(\d+)\.mlp\.experts\.(\d+)\.(gate|up|down)_proj"
    r"\.weight")


@dataclass(frozen=True)
class DbrxConfig(DecoderConfig):
    norm_type: str = "layernorm"
    norm_bias: bool = False
    tie_word_embeddings: bool = False
    rope_theta: float = 500_000.0
    eos_token_id: int = 100257
    bos_token_id: int = 100257

    @classmethod
    def from_hf_config(cls, cfg: dict[str, Any]) -> "DbrxConfig":
        attn = cfg.get("attn_config") or {}
        ffn = cfg.get("ffn_config") or {}
        act = ((ffn.get("ffn_act_fn") or {}).get("name", "silu"))
        if act != "silu":
            raise ValueError(f"DBRX ffn_act_fn {act!r} not supported")
        norm_w = ffn.get("moe_normalize_expert_weights", 1.0)
        heads = cfg["n_heads"]
        d = cfg["d_model"]
        eos = cfg.get("eos_token_id") or 100257
        return cls(
            vocab_size=cfg["vocab_size"],
            hidden_size=d,
            intermediate_size=ffn.get("ffn_hidden_size", 4 * d),
            num_hidden_layers=cfg["n_layers"],
            num_attention_heads=heads,
            num_key_value_heads=attn.get("kv_n_heads", 1),
            head_dim=d // heads,
            rope_theta=attn.get("rope_theta", 500_000.0),
            qkv_clip=float(attn.get("clip_qkv") or 0.0),
            num_experts=ffn.get("moe_num_experts", 16),
            num_experts_per_tok=ffn.get("moe_top_k", 4),
            moe_intermediate_size=ffn.get("ffn_hidden_size", 4 * d),
            norm_topk_prob=bool(norm_w),
            rms_norm_eps=1e-5,
            max_position_embeddings=cfg.get("max_seq_len", 32768),
            tie_word_embeddings=cfg.get("tie_word_embeddings", False),
            eos_token_id=eos,
            bos_token_id=cfg.get("bos_token_id") or eos,
        )


def _shim(cfg: DbrxConfig, get_tensor):
    q_rows = cfg.num_attention_heads * cfg.head_dim
    kv_rows = cfg.num_key_value_heads * cfg.head_dim
    inter = cfg.moe_intermediate_size

    def shim(name: str):
        if name in _TOP_MAP:
            return get_tensor(_TOP_MAP[name])
        m = _QKV_RX.fullmatch(name)
        if m:
            fused = np.asarray(get_tensor(
                f"transformer.blocks.{m.group(1)}.norm_attn_norm.attn"
                ".Wqkv.weight"))
            which = m.group(2)
            if which == "q":
                return fused[:q_rows]
            if which == "k":
                return fused[q_rows:q_rows + kv_rows]
            return fused[q_rows + kv_rows:q_rows + 2 * kv_rows]
        m = _EXPERT_RX.fullmatch(name)
        if m:
            i, e, which = m.group(1), int(m.group(2)), m.group(3)
            tname = {"gate": "w1", "up": "v1", "down": "w2"}[which]
            flat = np.asarray(get_tensor(
                f"transformer.blocks.{i}.ffn.experts.mlp.{tname}"))
            chunk = flat[e * inter:(e + 1) * inter]       # [I, D]
            # w1/v1 apply as x @ w.T ([out, in]); w2 applies as x @ w2
            # ([in, out] already) — stack_experts transposes every chunk,
            # so hand it w2 PRE-transposed to cancel.
            return chunk if which != "down" else chunk.T
        return get_tensor(name)

    return shim


def params_from_hf_state_dict(cfg: DbrxConfig, get_tensor,
                              dtype=jnp.bfloat16, quant=None, **kw):
    if quant is not None:
        raise ValueError("quantized DBRX checkpoints (fused layouts) "
                         "are not supported yet")
    return _dec.params_from_hf_state_dict(
        cfg, _shim(cfg, get_tensor), dtype=dtype, layer_map=_LAYER_MAP)
