"""Qwen v1 (QWenLMHeadModel): the original Qwen-7B/14B layout.

Reference: vllm/model_executor/models/qwen.py + the Qwen-7B remote-code
modeling. Semantically the shared decoder with:

- RMSNorm (``layer_norm_epsilon``), full neox rotary
  (``rotary_emb_base``), MHA, SwiGLU;
- fused ``transformer.h.{i}.attn.c_attn`` qkv WITH bias (the only bias
  in the network);
- MLP stored as ``mlp.w2`` (gate) / ``mlp.w1`` (up) / ``mlp.c_proj``
  (reference qwen.py stacked_params_mapping: w2 -> shard 0, w1 ->
  shard 1 of gate_up), with ``intermediate_size`` in the config being
  TWICE the actual ffn width (qwen.py ``config.intermediate_size // 2``);
- embeddings at ``transformer.wte``, final norm ``transformer.ln_f``.
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
class QwenV1Config(DecoderConfig):
    use_qkv_bias: bool = True
    rope_theta: float = 10_000.0
    tie_word_embeddings: bool = False
    eos_token_id: int = 151643
    bos_token_id: int = 151643

    @classmethod
    def from_hf_config(cls, cfg: dict[str, Any]) -> "QwenV1Config":
        heads = cfg["num_attention_heads"]
        d = cfg["hidden_size"]
        return cls(
            vocab_size=cfg["vocab_size"],
            hidden_size=d,
            intermediate_size=cfg["intermediate_size"] // 2,
            num_hidden_layers=cfg["num_hidden_layers"],
            num_attention_heads=heads,
            num_key_value_heads=heads,            # MHA
            head_dim=cfg.get("kv_channels") or d // heads,
            rms_norm_eps=cfg.get("layer_norm_epsilon", 1e-6),
            rope_theta=cfg.get("rotary_emb_base", 10_000.0),
            max_position_embeddings=cfg.get("seq_length", 8192),
            tie_word_embeddings=cfg.get("tie_word_embeddings", False),
            eos_token_id=cfg.get("eos_token_id") or 151643,
            bos_token_id=cfg.get("bos_token_id") or 151643,
        )


_QKV_RX = re.compile(
    r"model\.layers\.(\d+)\.self_attn\.([qkv])_proj\.(weight|bias)")


def _shim(cfg: QwenV1Config, get_tensor):
    n_out = cfg.num_attention_heads * cfg.head_dim

    def shim(name: str):
        m = _QKV_RX.fullmatch(name)
        if m:
            i, which, leaf = m.group(1), "qkv".index(m.group(2)), m.group(3)
            fused = np.asarray(
                get_tensor(f"transformer.h.{i}.attn.c_attn.{leaf}"))
            return fused[which * n_out:(which + 1) * n_out]
        name = (name
                .replace("model.embed_tokens.", "transformer.wte.")
                .replace("model.norm.", "transformer.ln_f."))
        m2 = re.fullmatch(r"model\.layers\.(\d+)\.(.+)", name)
        if m2:
            i, rest = m2.group(1), m2.group(2)
            rest = (rest
                    .replace("input_layernorm.", "ln_1.")
                    .replace("post_attention_layernorm.", "ln_2.")
                    .replace("self_attn.o_proj.", "attn.c_proj.")
                    .replace("mlp.gate_proj.", "mlp.w2.")
                    .replace("mlp.up_proj.", "mlp.w1.")
                    .replace("mlp.down_proj.", "mlp.c_proj."))
            return get_tensor(f"transformer.h.{i}.{rest}")
        return get_tensor(name)

    return shim


def params_from_hf_state_dict(cfg: QwenV1Config, get_tensor,
                              dtype=jnp.bfloat16, quant=None, **kw):
    if quant is not None:
        raise ValueError("quantized Qwen-v1 checkpoints (fused c_attn) "
                         "are not supported")
    return _dec.params_from_hf_state_dict(cfg, _shim(cfg, get_tensor),
                                          dtype=dtype)
