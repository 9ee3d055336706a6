"""InternLM2 / InternLM2.5: fused interleaved wqkv + w1/w3/w2 naming.

Reference: vllm/model_executor/models/internlm2.py — a llama-shaped GQA
decoder whose checkpoint differs only in names and the wqkv fusion:

- ``model.tok_embeddings.weight`` / ``output.weight`` (lm_head)
- ``model.layers.{i}.attention_norm`` / ``ffn_norm`` (input / post)
- ``model.layers.{i}.attention.wqkv.weight`` — INTERLEAVED per kv
  group: rows pack [group0: q0..q{G-1}, k0, v0][group1: ...] with
  G = heads // kv_heads query heads per group
  (internlm2.py:70-86 split_qkv)
- ``model.layers.{i}.attention.wo`` and ``feed_forward.w1/w3/w2``
  (gate/up/down)

Config key ``bias`` gates qkv+o biases (default False).
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

_LAYER_MAP = {
    "input_layernorm": "model.layers.{i}.attention_norm.weight",
    "post_attention_layernorm": "model.layers.{i}.ffn_norm.weight",
    "o_proj": "model.layers.{i}.attention.wo.weight",
    "gate_proj": "model.layers.{i}.feed_forward.w1.weight",
    "up_proj": "model.layers.{i}.feed_forward.w3.weight",
    "down_proj": "model.layers.{i}.feed_forward.w2.weight",
}
_TOP_MAP = {
    "model.embed_tokens.weight": "model.tok_embeddings.weight",
    "lm_head.weight": "output.weight",
}
_QKV_RX = re.compile(
    r"model\.layers\.(\d+)\.self_attn\.([qkv])_proj\.weight")


@dataclass(frozen=True)
class InternLM2Config(DecoderConfig):
    rope_theta: float = 1_000_000.0
    tie_word_embeddings: bool = False
    eos_token_id: int = 2
    bos_token_id: int = 1

    @classmethod
    def from_hf_config(cls, cfg) -> "InternLM2Config":
        base = super().from_hf_config(cfg)
        return dataclasses.replace(
            base,
            use_qkv_bias=bool(cfg.get("bias", False)),
            use_o_bias=bool(cfg.get("bias", False)),
            rms_norm_eps=cfg.get("rms_norm_eps", 1e-5),
            rope_theta=cfg.get("rope_theta", 1_000_000.0),
            tie_word_embeddings=cfg.get("tie_word_embeddings", False),
        )


def _shim(cfg: InternLM2Config, get_tensor):
    kh = cfg.num_key_value_heads
    g = cfg.num_attention_heads // kh     # q heads per kv group
    dh = cfg.head_dim

    def shim(name: str):
        if name in _TOP_MAP:
            return get_tensor(_TOP_MAP[name])
        m = _QKV_RX.fullmatch(name)
        if m:
            fused = np.asarray(get_tensor(
                f"model.layers.{m.group(1)}.attention.wqkv.weight"))
            d = fused.shape[-1]
            grouped = fused.reshape(kh, g + 2, dh, d)
            which = m.group(2)
            if which == "q":
                return grouped[:, :g].reshape(kh * g * dh, d)
            if which == "k":
                return grouped[:, g].reshape(kh * dh, d)
            return grouped[:, g + 1].reshape(kh * dh, d)
        return get_tensor(name)

    return shim


def params_from_hf_state_dict(cfg: InternLM2Config, get_tensor,
                              dtype=jnp.bfloat16, quant=None, **kw):
    if quant is not None:
        raise ValueError("quantized InternLM2 checkpoints (fused wqkv) "
                         "are not supported yet")
    return _dec.params_from_hf_state_dict(
        cfg, _shim(cfg, get_tensor), dtype=dtype, layer_map=_LAYER_MAP)
