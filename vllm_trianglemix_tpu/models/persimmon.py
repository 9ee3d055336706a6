"""Persimmon (PersimmonForCausalLM): per-head qk LayerNorm + partial
rotary over a biased LayerNorm decoder.

Reference: vllm/model_executor/models/persimmon.py + HF
transformers/models/persimmon/modeling_persimmon.py — Adept's 8B:

- fused ``query_key_value`` whose output rows interleave per head as
  [q_h, k_h, v_h] triples (HF _split_heads view(.., heads, 3, dh));
- per-head LayerNorm WITH bias on q and k before rope
  (``qk_layernorm``, the decoder's qk_norm_type="layernorm" knob);
- partial rotary (0.5, rotate-half), LayerNorm norms with bias,
  biased linears everywhere, non-gated relu^2 MLP, untied head.
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


@dataclass(frozen=True)
class PersimmonConfig(DecoderConfig):
    norm_type: str = "layernorm"
    gated_mlp: bool = False
    hidden_act: str = "relu2"
    use_qk_norm: bool = True
    qk_norm_type: str = "layernorm"
    use_qkv_bias: bool = True
    use_o_bias: bool = True
    use_mlp_bias: bool = True
    partial_rotary_factor: float = 0.5
    rope_theta: float = 25_000.0
    tie_word_embeddings: bool = False
    eos_token_id: int = 71013
    bos_token_id: int = 71013

    @classmethod
    def from_hf_config(cls, cfg: dict[str, Any]) -> "PersimmonConfig":
        heads = cfg["num_attention_heads"]
        d = cfg["hidden_size"]
        if not cfg.get("qk_layernorm", True):
            raise ValueError("Persimmon qk_layernorm=False checkpoints "
                             "are not supported (always on upstream)")
        return cls(
            vocab_size=cfg["vocab_size"],
            hidden_size=d,
            intermediate_size=cfg["intermediate_size"],
            num_hidden_layers=cfg["num_hidden_layers"],
            num_attention_heads=heads,
            num_key_value_heads=cfg.get("num_key_value_heads") or heads,
            head_dim=d // heads,
            rms_norm_eps=cfg.get("layer_norm_eps", 1e-5),
            rope_theta=cfg.get("rope_theta", 25_000.0),
            partial_rotary_factor=cfg.get("partial_rotary_factor", 0.5),
            hidden_act=("relu2" if cfg.get("hidden_act", "relu2")
                        in ("relu2", "relu_squared") else
                        cfg.get("hidden_act")),
            max_position_embeddings=cfg.get("max_position_embeddings",
                                            16_384),
            tie_word_embeddings=cfg.get("tie_word_embeddings", False),
            eos_token_id=cfg.get("eos_token_id") or 71013,
            bos_token_id=cfg.get("bos_token_id") or 71013,
        )


_QKV_RX = re.compile(
    r"model\.layers\.(\d+)\.self_attn\.([qkv])_proj\.(weight|bias)")
_QKNORM_RX = re.compile(
    r"model\.layers\.(\d+)\.self_attn\.([qk])_norm\.(weight|bias)")


def _shim(cfg: PersimmonConfig, get_tensor):
    n, hd = cfg.num_attention_heads, cfg.head_dim

    def split_qkv(w, which: int):
        w = np.asarray(w)
        return w.reshape((n, 3, hd) + w.shape[1:])[:, which].reshape(
            (n * hd,) + w.shape[1:])

    def shim(name: str):
        name = name.replace("model.norm.", "model.final_layernorm.")
        m = _QKV_RX.fullmatch(name)
        if m:
            i, which, leaf = m.group(1), "qkv".index(m.group(2)), m.group(3)
            return split_qkv(get_tensor(
                f"model.layers.{i}.self_attn.query_key_value.{leaf}"),
                which)
        m = _QKNORM_RX.fullmatch(name)
        if m:
            return get_tensor(
                f"model.layers.{m.group(1)}.self_attn"
                f".{m.group(2)}_layernorm.{m.group(3)}")
        if ".self_attn.o_proj." in name:
            return get_tensor(name.replace("self_attn.o_proj",
                                           "self_attn.dense"))
        if ".mlp.up_proj." in name:
            return get_tensor(name.replace("mlp.up_proj",
                                           "mlp.dense_h_to_4h"))
        if ".mlp.down_proj." in name:
            return get_tensor(name.replace("mlp.down_proj",
                                           "mlp.dense_4h_to_h"))
        return get_tensor(name)

    return shim


def params_from_hf_state_dict(cfg: PersimmonConfig, get_tensor,
                              dtype=jnp.bfloat16, quant=None, **kw):
    if quant is not None:
        raise ValueError("quantized Persimmon checkpoints (fused "
                         "query_key_value) are not supported")
    return _dec.params_from_hf_state_dict(cfg, _shim(cfg, get_tensor),
                                          dtype=dtype)
