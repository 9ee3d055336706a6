"""GPTBigCode (StarCoder-1 / SantaCoder): learned positions + MQA.

Reference: vllm/model_executor/models/gpt_bigcode.py + HF
transformers/models/gpt_bigcode/modeling_gpt_bigcode.py — GPT-2-shaped
blocks (wte + wpe, pre-LayerNorm, biased non-gated gelu MLP) with
multi-query attention: the fused ``c_attn`` nn.Linear emits
[q (D) | k (head_dim) | v (head_dim)] rows for ONE shared KV head.
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
class GptBigCodeConfig(DecoderConfig):
    use_rope: bool = False
    learned_pos_embeddings: bool = True
    norm_type: str = "layernorm"
    gated_mlp: bool = False
    hidden_act: str = "gelu_tanh"
    use_qkv_bias: bool = True
    use_o_bias: bool = True
    use_mlp_bias: bool = True
    tie_word_embeddings: bool = True
    rope_theta: float = 0.0
    eos_token_id: int = 0
    bos_token_id: int = 0

    @classmethod
    def from_hf_config(cls, cfg) -> "GptBigCodeConfig":
        d = dict(cfg)
        hidden = d.get("n_embd", d.get("hidden_size"))
        heads = d.get("n_head", d.get("num_attention_heads"))
        act = d.get("activation_function", "gelu_pytorch_tanh")
        return cls(
            vocab_size=d["vocab_size"],
            hidden_size=hidden,
            intermediate_size=d.get("n_inner") or 4 * hidden,
            num_hidden_layers=d.get("n_layer", d.get("num_hidden_layers")),
            num_attention_heads=heads,
            num_key_value_heads=1 if d.get("multi_query", True) else heads,
            head_dim=hidden // heads,
            rms_norm_eps=d.get("layer_norm_epsilon", 1e-5),
            hidden_act={"gelu_pytorch_tanh": "gelu_tanh",
                        "gelu_new": "gelu_tanh",
                        "gelu": "gelu"}.get(act, act),
            max_position_embeddings=d.get("n_positions", 8192),
            tie_word_embeddings=d.get("tie_word_embeddings", True),
            eos_token_id=d.get("eos_token_id", 0),
            bos_token_id=d.get("bos_token_id", 0),
        )


_RX = re.compile(r"model\.layers\.(\d+)\.(.+)")
_QKV = re.compile(r"self_attn\.([qkv])_proj\.(weight|bias)")

_LEAF = {
    "input_layernorm.weight": "ln_1.weight",
    "input_layernorm.bias": "ln_1.bias",
    "post_attention_layernorm.weight": "ln_2.weight",
    "post_attention_layernorm.bias": "ln_2.bias",
    "self_attn.o_proj.weight": "attn.c_proj.weight",
    "self_attn.o_proj.bias": "attn.c_proj.bias",
    "mlp.up_proj.weight": "mlp.c_fc.weight",
    "mlp.up_proj.bias": "mlp.c_fc.bias",
    "mlp.down_proj.weight": "mlp.c_proj.weight",
    "mlp.down_proj.bias": "mlp.c_proj.bias",
}


def _shim(cfg: GptBigCodeConfig, get_tensor):
    D = cfg.hidden_size
    kv_rows = cfg.num_key_value_heads * cfg.head_dim

    def shim(name: str):
        top = {
            "model.embed_tokens.weight": "transformer.wte.weight",
            "model.embed_positions.weight": "transformer.wpe.weight",
            "model.norm.weight": "transformer.ln_f.weight",
            "model.norm.bias": "transformer.ln_f.bias",
        }
        if name in top:
            return get_tensor(top[name])
        m = _RX.fullmatch(name)
        assert m, name
        i, leaf = m.group(1), m.group(2)
        h = f"transformer.h.{i}"
        qm = _QKV.fullmatch(leaf)
        if qm:
            # fused nn.Linear rows: [q (D) | k (kv_rows) | v (kv_rows)]
            fused = np.asarray(get_tensor(f"{h}.attn.c_attn.{qm.group(2)}"))
            which = qm.group(1)
            if which == "q":
                return fused[:D]
            if which == "k":
                return fused[D:D + kv_rows]
            return fused[D + kv_rows:D + 2 * kv_rows]
        return get_tensor(f"{h}.{_LEAF[leaf]}")

    return shim


def params_from_hf_state_dict(cfg: GptBigCodeConfig, get_tensor,
                              dtype=jnp.bfloat16, quant=None, **kw):
    if quant is not None:
        raise ValueError("quantized GPTBigCode checkpoints (fused "
                         "layouts) are not supported yet")
    return decoder.params_from_hf_state_dict(
        cfg, _shim(cfg, get_tensor), dtype=dtype, **kw)
