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


def params_from_hf_state_dict(cfg: HunYuanDenseConfig, get_tensor,
                              dtype=jnp.bfloat16, quant=None, **kw):
    return _dec.params_from_hf_state_dict(
        cfg, get_tensor, dtype=dtype, quant=quant, layer_map=_LAYER_MAP)
