"""ChatGLM2/3 and GLM-4 native-format checkpoints (ChatGLMModel /
ChatGLMForConditionalGeneration).

Reference: vllm/model_executor/models/chatglm.py. Semantically the
GLM decoder this repo already serves (models/glm.py — RMSNorm, SwiGLU,
rotary over HALF of head_dim applied GPT-J-interleaved: chatglm.py
builds ``get_rope(rotary_dim=head_dim // 2, is_neox_style=not
config.original_rope)``), under THUDM's native names:

- ``transformer.embedding.word_embeddings`` / ``transformer.encoder.
  layers.{i}`` / ``transformer.encoder.final_layernorm`` /
  ``transformer.output_layer``;
- fused ``self_attention.query_key_value`` ([q; k; v] rows, bias from
  ``add_qkv_bias``), ``self_attention.dense`` (no bias);
- fused ``mlp.dense_h_to_4h`` = [gate; up] halves, ``dense_4h_to_h``;
- MQA via ``multi_query_group_num`` KV heads, vocab from
  ``padded_vocab_size``, eps from ``layernorm_epsilon``, rope base
  ``10000 * rope_ratio``.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import Any

import jax.numpy as jnp
import numpy as np

from vllm_trianglemix_tpu.models import decoder as _dec
from vllm_trianglemix_tpu.models.glm import (  # noqa: F401 (re-export)
    GlmConfig,
    compute_logits,
    forward,
    init_random,
    kv_cache_spec,
    partition_specs,
    shape_tree,
)


@dataclass(frozen=True)
class ChatGlmConfig(GlmConfig):
    eos_token_id: int = 2
    bos_token_id: int = 1

    @classmethod
    def from_hf_config(cls, cfg: dict[str, Any]) -> "ChatGlmConfig":
        if not cfg.get("rmsnorm", True):
            raise ValueError("ChatGLM rmsnorm=False checkpoints are not "
                             "supported")
        if cfg.get("apply_residual_connection_post_layernorm", False):
            raise ValueError("ChatGLM post-layernorm residual variant is "
                             "not supported")
        if not cfg.get("original_rope", True):
            raise ValueError("ChatGLM original_rope=False (neox-style) "
                             "checkpoints are not supported")
        if cfg.get("add_bias_linear", False):
            raise ValueError("ChatGLM add_bias_linear checkpoints are not "
                             "supported")
        heads = cfg["num_attention_heads"]
        kv = (cfg.get("multi_query_group_num", heads)
              if cfg.get("multi_query_attention", False) else heads)
        return cls(
            vocab_size=cfg.get("padded_vocab_size") or cfg["vocab_size"],
            hidden_size=cfg["hidden_size"],
            intermediate_size=cfg["ffn_hidden_size"],
            num_hidden_layers=cfg["num_layers"],
            num_attention_heads=heads,
            num_key_value_heads=kv,
            head_dim=cfg["hidden_size"] // heads,
            rms_norm_eps=cfg.get("layernorm_epsilon", 1e-5),
            rope_theta=10_000.0 * cfg.get("rope_ratio", 1.0),
            partial_rotary_factor=0.5,
            use_qkv_bias=bool(cfg.get("add_qkv_bias", True)),
            max_position_embeddings=cfg.get("seq_length", 32768),
            tie_word_embeddings=cfg.get("tie_word_embeddings", False),
            eos_token_id=cfg.get("eos_token_id") or 2,
            bos_token_id=cfg.get("bos_token_id") or 1,
        )


_QKV_RX = re.compile(
    r"model\.layers\.(\d+)\.self_attn\.([qkv])_proj\.(weight|bias)")
_GU_RX = re.compile(r"model\.layers\.(\d+)\.mlp\.(gate|up)_proj\.weight")


def _shim(cfg: ChatGlmConfig, get_tensor):
    nq = cfg.num_attention_heads * cfg.head_dim
    nk = cfg.num_key_value_heads * cfg.head_dim
    inter = cfg.intermediate_size
    starts = {"q": 0, "k": nq, "v": nq + nk}
    sizes = {"q": nq, "k": nk, "v": nk}

    def shim(name: str):
        m = _QKV_RX.fullmatch(name)
        if m:
            i, which, leaf = m.group(1), m.group(2), m.group(3)
            leaf = "weight" if leaf == "weight" else "bias"
            fused = np.asarray(get_tensor(
                f"transformer.encoder.layers.{i}.self_attention"
                f".query_key_value.{leaf}"))
            return fused[starts[which]:starts[which] + sizes[which]]
        m = _GU_RX.fullmatch(name)
        if m:
            fused = np.asarray(get_tensor(
                f"transformer.encoder.layers.{m.group(1)}.mlp"
                ".dense_h_to_4h.weight"))
            return fused[:inter] if m.group(2) == "gate" else fused[inter:]
        name = (name
                .replace("model.embed_tokens.",
                         "transformer.embedding.word_embeddings.")
                .replace("model.norm.",
                         "transformer.encoder.final_layernorm.")
                .replace("lm_head.", "transformer.output_layer."))
        m2 = re.fullmatch(r"model\.layers\.(\d+)\.(.+)", name)
        if m2:
            rest = (m2.group(2)
                    .replace("self_attn.o_proj.", "self_attention.dense.")
                    .replace("mlp.down_proj.", "mlp.dense_4h_to_h."))
            return get_tensor(
                f"transformer.encoder.layers.{m2.group(1)}.{rest}")
        return get_tensor(name)

    return shim


def params_from_hf_state_dict(cfg: ChatGlmConfig, get_tensor,
                              dtype=jnp.bfloat16, quant=None, **kw):
    if quant is not None:
        raise ValueError("quantized ChatGLM checkpoints (fused "
                         "query_key_value) are not supported")
    return _dec.params_from_hf_state_dict(cfg, _shim(cfg, get_tensor),
                                          dtype=dtype)
