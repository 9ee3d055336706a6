"""Baichuan / Baichuan2 (7B rope variants): fused W_pack qkv.

Reference: vllm/model_executor/models/baichuan.py — llama-shaped MHA
with one fused ``self_attn.W_pack.weight`` [3*D, D]; otherwise
llama-canonical names. The 7B models (arch "BaiChuanForCausalLM") use
rope; the 13B models ("BaichuanForCausalLM") use ALiBi, which routes
through the same module once the config requests it (alibi rides the
XLA attention path, attention/backend.py).

Baichuan2 checkpoints (vocab 125696) carry a NormHead: lm_head rows are
L2-normalized at load (baichuan.py:349-355).
"""

from __future__ import annotations

import dataclasses
import re
from dataclasses import dataclass

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

_QKV_RX = re.compile(
    r"model\.layers\.(\d+)\.self_attn\.([qkv])_proj\.weight")


@dataclass(frozen=True)
class BaichuanConfig(DecoderConfig):
    rope_theta: float = 10_000.0
    tie_word_embeddings: bool = False
    eos_token_id: int = 2
    bos_token_id: int = 1

    @classmethod
    def from_hf_config(cls, cfg) -> "BaichuanConfig":
        arch = (cfg.get("architectures") or [""])[0]
        base = super().from_hf_config(cfg)
        kw = dict(
            rms_norm_eps=cfg.get("rms_norm_eps", 1e-6),
            rope_theta=cfg.get("rope_theta", 10_000.0),
            tie_word_embeddings=cfg.get("tie_word_embeddings", False),
        )
        # 13B layout ("BaichuanForCausalLM", >= 40 heads or explicit
        # alibi key) has no rope: ALiBi biases with the closest-pow2
        # slopes (reference baichuan.py:57,154-166), XLA attention path.
        if arch == "BaichuanForCausalLM" and (
                cfg.get("num_attention_heads", 0) >= 40
                or cfg.get("position_embedding_type") == "alibi"):
            kw["use_rope"] = False
            kw["alibi_slopes"] = _dec.alibi_slopes_closest_pow2(
                cfg["num_attention_heads"])
        return dataclasses.replace(base, **kw)


def _shim(cfg: BaichuanConfig, get_tensor):
    d = cfg.num_attention_heads * cfg.head_dim

    def shim(name: str):
        m = _QKV_RX.fullmatch(name)
        if m:
            fused = np.asarray(get_tensor(
                f"model.layers.{m.group(1)}.self_attn.W_pack.weight"))
            which = m.group(2)
            off = {"q": 0, "k": 1, "v": 2}[which]
            return fused[off * d:(off + 1) * d]
        return get_tensor(name)

    return shim


def params_from_hf_state_dict(cfg: BaichuanConfig, get_tensor,
                              dtype=jnp.bfloat16, quant=None, **kw):
    if quant is not None:
        raise ValueError("quantized Baichuan checkpoints (fused W_pack) "
                         "are not supported yet")
    params = _dec.params_from_hf_state_dict(
        cfg, _shim(cfg, get_tensor), dtype=dtype)
    if cfg.vocab_size == 125696 and "lm_head" in params:
        # Baichuan2 NormHead: logits use the L2-normalized head rows.
        w = params["lm_head"]                       # [D, V]
        norm = jnp.linalg.norm(w.astype(jnp.float32), axis=0,
                               keepdims=True)
        params["lm_head"] = (w / jnp.maximum(norm, 1e-7)).astype(w.dtype)
    return params
