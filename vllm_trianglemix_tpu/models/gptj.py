"""GPT-J 6B: interleaved partial rotary + parallel shared-norm block.

Reference: vllm/model_executor/models/gpt_j.py + HF
transformers/models/gptj/modeling_gptj.py — ONE input LayerNorm feeds
both attention and the MLP (x + attn(h) + mlp(h)), rotate-every-two
rotary over the first ``rotary_dim`` dims, bias-free q/k/v/out, biased
non-gated gelu_new MLP (fc_in/fc_out), untied lm_head WITH bias.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

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


@dataclass(frozen=True)
class GptJConfig(DecoderConfig):
    norm_type: str = "layernorm"
    gated_mlp: bool = False
    hidden_act: str = "gelu_tanh"
    use_mlp_bias: bool = True
    parallel_block: bool = True
    parallel_block_shared_norm: bool = True
    rope_interleaved: bool = True
    partial_rotary_factor: float = 0.25
    tie_word_embeddings: bool = False
    lm_head_bias: bool = True
    rope_theta: float = 10_000.0
    eos_token_id: int = 50256
    bos_token_id: int = 50256

    @classmethod
    def from_hf_config(cls, cfg) -> "GptJConfig":
        d = dict(cfg)
        hidden = d.get("n_embd", d.get("hidden_size"))
        heads = d.get("n_head", d.get("num_attention_heads"))
        head_dim = hidden // heads
        inner = d.get("n_inner") or 4 * hidden
        act = d.get("activation_function", "gelu_new")
        return cls(
            vocab_size=d["vocab_size"],
            hidden_size=hidden,
            intermediate_size=inner,
            num_hidden_layers=d.get("n_layer", d.get("num_hidden_layers")),
            num_attention_heads=heads,
            num_key_value_heads=heads,
            head_dim=head_dim,
            rms_norm_eps=d.get("layer_norm_epsilon", 1e-5),
            partial_rotary_factor=d.get("rotary_dim", head_dim) / head_dim,
            hidden_act={"gelu_new": "gelu_tanh",
                        "gelu": "gelu"}.get(act, act),
            max_position_embeddings=d.get("n_positions", 2048),
            tie_word_embeddings=d.get("tie_word_embeddings", False),
            eos_token_id=d.get("eos_token_id", 50256),
            bos_token_id=d.get("bos_token_id", 50256),
        )


_RX = re.compile(r"model\.layers\.(\d+)\.(.+)")

_LEAF = {
    "input_layernorm.weight": "ln_1.weight",
    "input_layernorm.bias": "ln_1.bias",
    "self_attn.q_proj.weight": "attn.q_proj.weight",
    "self_attn.k_proj.weight": "attn.k_proj.weight",
    "self_attn.v_proj.weight": "attn.v_proj.weight",
    "self_attn.o_proj.weight": "attn.out_proj.weight",
    "mlp.up_proj.weight": "mlp.fc_in.weight",
    "mlp.up_proj.bias": "mlp.fc_in.bias",
    "mlp.down_proj.weight": "mlp.fc_out.weight",
    "mlp.down_proj.bias": "mlp.fc_out.bias",
}


def _shim(get_tensor):
    def shim(name: str):
        top = {
            "model.embed_tokens.weight": "transformer.wte.weight",
            "model.norm.weight": "transformer.ln_f.weight",
            "model.norm.bias": "transformer.ln_f.bias",
            "lm_head.weight": "lm_head.weight",
            "lm_head.bias": "lm_head.bias",
        }
        if name in top:
            return get_tensor(top[name])
        m = _RX.fullmatch(name)
        assert m, name
        return get_tensor(
            f"transformer.h.{m.group(1)}.{_LEAF[m.group(2)]}")

    return shim


def params_from_hf_state_dict(cfg: GptJConfig, get_tensor,
                              dtype=jnp.bfloat16, quant=None, **kw):
    if quant is not None:
        raise ValueError("quantized GPT-J checkpoints are not supported")
    return decoder.params_from_hf_state_dict(
        cfg, _shim(get_tensor), dtype=dtype, **kw)
