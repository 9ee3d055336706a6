"""GPT-NeoX (Pythia / OLMo-0): partial rotary + parallel residual.

Reference: vllm/model_executor/models/gpt_neox.py + HF
transformers/models/gpt_neox/modeling_gpt_neox.py — LayerNorm blocks,
fused per-head-interleaved query_key_value ([H, 3, Dh] row blocks),
rotary over the first rotary_pct of head_dim, parallel attn+MLP
residual (use_parallel_residual, two norms both reading x), non-gated
gelu MLP, untied embed_out.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from vllm_trianglemix_tpu.models import decoder
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
class GptNeoXConfig(DecoderConfig):
    norm_type: str = "layernorm"
    gated_mlp: bool = False
    hidden_act: str = "gelu"
    use_qkv_bias: bool = True
    use_o_bias: bool = True
    use_mlp_bias: bool = True
    parallel_block: bool = True
    partial_rotary_factor: float = 0.25
    tie_word_embeddings: bool = False
    rope_theta: float = 10_000.0
    eos_token_id: int = 0
    bos_token_id: int = 0

    @classmethod
    def from_hf_config(cls, cfg) -> "GptNeoXConfig":
        d = dict(cfg)
        heads = d["num_attention_heads"]
        act = d.get("hidden_act", "gelu")
        return cls(
            vocab_size=d["vocab_size"],
            hidden_size=d["hidden_size"],
            intermediate_size=d.get("intermediate_size",
                                    4 * d["hidden_size"]),
            num_hidden_layers=d["num_hidden_layers"],
            num_attention_heads=heads,
            num_key_value_heads=heads,
            head_dim=d["hidden_size"] // heads,
            rms_norm_eps=d.get("layer_norm_eps", 1e-5),
            rope_theta=d.get("rotary_emb_base", 10_000.0),
            partial_rotary_factor=d.get("rotary_pct", 0.25),
            parallel_block=bool(d.get("use_parallel_residual", True)),
            use_qkv_bias=bool(d.get("attention_bias", True)),
            use_o_bias=bool(d.get("attention_bias", True)),
            hidden_act={"gelu": "gelu", "gelu_new": "gelu_tanh",
                        "gelu_fast": "gelu_tanh"}.get(act, act),
            max_position_embeddings=d.get("max_position_embeddings", 2048),
            tie_word_embeddings=d.get("tie_word_embeddings", False),
            eos_token_id=d.get("eos_token_id", 0),
            bos_token_id=d.get("bos_token_id", 0),
        )


_RX = re.compile(r"model\.layers\.(\d+)\.(.+)")
_QKV_W = re.compile(r"self_attn\.([qkv])_proj\.weight")
_QKV_B = re.compile(r"self_attn\.([qkv])_proj\.bias")

_LEAF = {
    "input_layernorm.weight": "input_layernorm.weight",
    "input_layernorm.bias": "input_layernorm.bias",
    "post_attention_layernorm.weight": "post_attention_layernorm.weight",
    "post_attention_layernorm.bias": "post_attention_layernorm.bias",
    "self_attn.o_proj.weight": "attention.dense.weight",
    "self_attn.o_proj.bias": "attention.dense.bias",
    "mlp.up_proj.weight": "mlp.dense_h_to_4h.weight",
    "mlp.up_proj.bias": "mlp.dense_h_to_4h.bias",
    "mlp.down_proj.weight": "mlp.dense_4h_to_h.weight",
    "mlp.down_proj.bias": "mlp.dense_4h_to_h.bias",
}


def _shim(cfg: GptNeoXConfig, get_tensor):
    H, Dh, D = cfg.num_attention_heads, cfg.head_dim, cfg.hidden_size

    def shim(name: str):
        top = {
            "model.embed_tokens.weight": "gpt_neox.embed_in.weight",
            "model.norm.weight": "gpt_neox.final_layer_norm.weight",
            "model.norm.bias": "gpt_neox.final_layer_norm.bias",
            "lm_head.weight": "embed_out.weight",
        }
        if name in top:
            return get_tensor(top[name])
        m = _RX.fullmatch(name)
        assert m, name
        i, leaf = m.group(1), m.group(2)
        prefix = f"gpt_neox.layers.{i}"
        qm = _QKV_W.fullmatch(leaf)
        if qm:
            # fused rows interleave per head: [H, (q, k, v), Dh, D]
            w = np.asarray(get_tensor(
                f"{prefix}.attention.query_key_value.weight"))
            j = "qkv".index(qm.group(1))
            return w.reshape(H, 3, Dh, D)[:, j].reshape(H * Dh, D)
        qm = _QKV_B.fullmatch(leaf)
        if qm:
            b = np.asarray(get_tensor(
                f"{prefix}.attention.query_key_value.bias"))
            j = "qkv".index(qm.group(1))
            return b.reshape(H, 3, Dh)[:, j].reshape(H * Dh)
        return get_tensor(f"{prefix}.{_LEAF[leaf]}")

    return shim


def params_from_hf_state_dict(cfg: GptNeoXConfig, get_tensor,
                              dtype=jnp.bfloat16, quant=None, **kw):
    if quant is not None:
        raise ValueError("quantized GPT-NeoX checkpoints (fused "
                         "per-head layouts) are not supported yet")
    return decoder.params_from_hf_state_dict(
        cfg, _shim(cfg, get_tensor), dtype=dtype, **kw)
