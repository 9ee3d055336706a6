"""StarCoder2: GPT-style LayerNorm + biased linears + non-gated MLP.

Reference: vllm/model_executor/models/starcoder2.py + HF
transformers/models/starcoder2/modeling_starcoder2.py — LayerNorm (with
bias) pre-norm blocks, bias on q/k/v/o AND the MLP linears (use_bias),
non-gated MLP (c_fc -> gelu_pytorch_tanh -> c_proj), GQA + rope,
optional sliding window, tied embeddings. All expressed through the
generic decoder's norm_type / gated_mlp / bias knobs; the weight map
aliases c_fc/c_proj onto up_proj/down_proj.
"""

from __future__ import annotations

from dataclasses import dataclass, replace

import jax.numpy as jnp

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

_LAYER_MAP = {
    "up_proj": "model.layers.{i}.mlp.c_fc.weight",
    "up_bias": "model.layers.{i}.mlp.c_fc.bias",
    "down_proj": "model.layers.{i}.mlp.c_proj.weight",
    "down_bias": "model.layers.{i}.mlp.c_proj.bias",
}


@dataclass(frozen=True)
class Starcoder2Config(DecoderConfig):
    norm_type: str = "layernorm"
    gated_mlp: bool = False
    use_qkv_bias: bool = True
    use_o_bias: bool = True
    use_mlp_bias: bool = True
    hidden_act: str = "gelu_tanh"
    rope_theta: float = 100_000.0
    tie_word_embeddings: bool = True
    eos_token_id: int = 0
    bos_token_id: int = 0

    @classmethod
    def from_hf_config(cls, cfg) -> "Starcoder2Config":
        base = super().from_hf_config(cfg)
        bias = bool(cfg.get("use_bias", True))
        act = cfg.get("hidden_act", "gelu_pytorch_tanh")
        return replace(
            base,
            norm_type="layernorm",
            gated_mlp=False,
            use_qkv_bias=bias,
            use_o_bias=bias,
            use_mlp_bias=bias,
            hidden_act={"gelu_pytorch_tanh": "gelu_tanh",
                        "gelu": "gelu"}.get(act, act),
            rms_norm_eps=cfg.get("norm_epsilon", 1e-5),
            tie_word_embeddings=cfg.get("tie_word_embeddings", True),
        )


def params_from_hf_state_dict(cfg: Starcoder2Config, get_tensor,
                              dtype=jnp.bfloat16, quant=None, **kw):
    return decoder.params_from_hf_state_dict(
        cfg, get_tensor, dtype=dtype, quant=quant,
        layer_map=_LAYER_MAP, **kw)
