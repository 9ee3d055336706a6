"""GPT-2: learned absolute positions, LayerNorm, fused Conv1D weights.

Reference: vllm/model_executor/models/gpt2.py + HF
transformers/models/gpt2/modeling_gpt2.py — wte + wpe embeddings (no
rope), pre-LayerNorm blocks with bias everywhere, fused ``c_attn``
qkv Conv1D ([in, 3*out] — already [in, out] in our layout), non-gated
gelu_new MLP (c_fc -> c_proj), tied lm_head. Expressed entirely through
the generic decoder's use_rope/learned_pos/norm/bias knobs; the shim
maps canonical names onto the ``transformer.h.{i}`` checkpoint tree and
splits c_attn.
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
class Gpt2Config(DecoderConfig):
    use_rope: bool = False
    learned_pos_embeddings: bool = True
    norm_type: str = "layernorm"
    gated_mlp: bool = False
    hidden_act: str = "gelu_tanh"        # gelu_new == tanh approximation
    use_qkv_bias: bool = True
    use_o_bias: bool = True
    use_mlp_bias: bool = True
    tie_word_embeddings: bool = True
    rope_theta: float = 0.0
    eos_token_id: int = 50256
    bos_token_id: int = 50256

    @classmethod
    def from_hf_config(cls, cfg) -> "Gpt2Config":
        # GPT2Config uses its own key names (n_embd/n_layer/n_head/...)
        d = dict(cfg)
        hidden = d.get("n_embd", d.get("hidden_size"))
        heads = d.get("n_head", d.get("num_attention_heads"))
        inner = d.get("n_inner") or 4 * hidden
        return cls(
            vocab_size=d["vocab_size"],
            hidden_size=hidden,
            intermediate_size=inner,
            num_hidden_layers=d.get("n_layer", d.get("num_hidden_layers")),
            num_attention_heads=heads,
            num_key_value_heads=heads,
            head_dim=hidden // heads,
            rms_norm_eps=d.get("layer_norm_epsilon", 1e-5),
            max_position_embeddings=d.get("n_positions", 1024),
            eos_token_id=d.get("eos_token_id", 50256),
            bos_token_id=d.get("bos_token_id", 50256),
        )


_RX = re.compile(r"model\.layers\.(\d+)\.(.+)")


def _shim(cfg: Gpt2Config, get_tensor):
    D = cfg.hidden_size

    def fused_col(i: str, lo: int, hi: int) -> np.ndarray:
        # Conv1D stores [in, out]; decoder.stack() transposes q/k/v/o, so
        # hand back [out, in] slices like an nn.Linear checkpoint would.
        w = np.asarray(get_tensor(f"transformer.h.{i}.attn.c_attn.weight"))
        return w[:, lo:hi].T

    def shim(name: str) -> np.ndarray:
        if name == "model.embed_tokens.weight":
            return get_tensor("transformer.wte.weight")
        if name == "model.embed_positions.weight":
            return get_tensor("transformer.wpe.weight")
        if name == "model.norm.weight":
            return get_tensor("transformer.ln_f.weight")
        if name == "model.norm.bias":
            return get_tensor("transformer.ln_f.bias")
        m = _RX.fullmatch(name)
        assert m, name
        i, leaf = m.group(1), m.group(2)
        h = f"transformer.h.{i}"
        if leaf == "self_attn.q_proj.weight":
            return fused_col(i, 0, D)
        if leaf == "self_attn.k_proj.weight":
            return fused_col(i, D, 2 * D)
        if leaf == "self_attn.v_proj.weight":
            return fused_col(i, 2 * D, 3 * D)
        if leaf.startswith("self_attn.") and leaf.endswith("_proj.bias") \
                and leaf[10] in "qkv":
            b = np.asarray(get_tensor(f"{h}.attn.c_attn.bias"))
            j = "qkv".index(leaf[10])
            return b[j * D:(j + 1) * D]
        table = {
            "input_layernorm.weight": f"{h}.ln_1.weight",
            "input_layernorm.bias": f"{h}.ln_1.bias",
            "post_attention_layernorm.weight": f"{h}.ln_2.weight",
            "post_attention_layernorm.bias": f"{h}.ln_2.bias",
            "self_attn.o_proj.bias": f"{h}.attn.c_proj.bias",
            "mlp.up_proj.bias": f"{h}.mlp.c_fc.bias",
            "mlp.down_proj.bias": f"{h}.mlp.c_proj.bias",
        }
        if leaf in table:
            return get_tensor(table[leaf])
        conv1d = {
            "self_attn.o_proj.weight": f"{h}.attn.c_proj.weight",
            "mlp.up_proj.weight": f"{h}.mlp.c_fc.weight",
            "mlp.down_proj.weight": f"{h}.mlp.c_proj.weight",
        }
        if leaf in conv1d:
            return np.asarray(get_tensor(conv1d[leaf])).T
        raise KeyError(name)

    return shim


def params_from_hf_state_dict(cfg: Gpt2Config, get_tensor,
                              dtype=jnp.bfloat16, quant=None, **kw):
    if quant is not None:
        raise ValueError("quantized GPT-2 checkpoints (fused Conv1D "
                         "layouts) are not supported yet")
    return decoder.params_from_hf_state_dict(
        cfg, _shim(cfg, get_tensor), dtype=dtype, **kw)
