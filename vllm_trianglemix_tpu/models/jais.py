"""JAIS (JAISLMHeadModel — core42 Arabic/English 13B/30B).

Reference: vllm/model_executor/models/jais.py. A GPT-2-shaped decoder
(LayerNorm + biased fused-Conv1D projections) with:

- ALiBi positions (closest-pow2 slope recipe shared with Bloom —
  jais.py:60-72 == decoder.alibi_slopes_closest_pow2), no wpe;
- SwiGLU MLP from split Conv1Ds: ``c_proj(c_fc(x) * silu(c_fc2(x)))``
  (jais.py:54-57,168-172 — c_fc2 is the silu gate, c_fc the up side);
- muP scales: ``embeddings_scale`` on the token embeddings,
  ``width_scale`` (or mup_output_alpha * mup_width_scale) MULTIPLYING
  the logits (jais.py:307-313 — the decoder's logits_scaling divisor is
  its inverse), and with ``scale_qk_dot_by_d`` attention scaled by
  1/head_dim instead of 1/sqrt(head_dim) (jais.py:92-95).
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
    alibi_slopes_closest_pow2,
    compute_logits,
    forward,
    init_random,
    kv_cache_spec,
    partition_specs,
    shape_tree,
)


@dataclass(frozen=True)
class JaisConfig(DecoderConfig):
    norm_type: str = "layernorm"
    use_rope: bool = False
    use_qkv_bias: bool = True
    use_o_bias: bool = True
    use_mlp_bias: bool = True
    hidden_act: str = "silu"
    tie_word_embeddings: bool = True
    eos_token_id: int = 0
    bos_token_id: int = 0

    @classmethod
    def from_hf_config(cls, cfg: dict[str, Any]) -> "JaisConfig":
        if cfg.get("position_embedding_type", "alibi") != "alibi":
            raise ValueError("JAIS learned-position checkpoints are not "
                             "supported (published models use ALiBi)")
        heads = cfg.get("n_head") or cfg["num_attention_heads"]
        d = cfg.get("n_embd") or cfg["hidden_size"]
        if cfg.get("activation_function", "swiglu") != "swiglu":
            raise ValueError("JAIS non-swiglu activation_function is not "
                             "supported")
        head_dim = d // heads
        scale_by_d = bool(cfg.get("mup_scale_qk_dot_by_d")
                          or cfg.get("scale_qk_dot_by_d"))
        emb_scale = (cfg.get("embeddings_scale")
                     or cfg.get("mup_embeddings_scale") or 1.0)
        out_scale = (cfg.get("width_scale")
                     or (cfg.get("mup_output_alpha", 1.0)
                         * cfg.get("mup_width_scale", 1.0)))
        return cls(
            vocab_size=cfg["vocab_size"],
            hidden_size=d,
            intermediate_size=(cfg.get("n_inner") or 4 * d),
            num_hidden_layers=cfg.get("n_layer")
            or cfg["num_hidden_layers"],
            num_attention_heads=heads,
            num_key_value_heads=heads,            # MHA
            head_dim=head_dim,
            rms_norm_eps=cfg.get("layer_norm_epsilon", 1e-5),
            alibi_slopes=alibi_slopes_closest_pow2(heads),
            attention_multiplier=(head_dim ** -1.0 if scale_by_d
                                  else None),
            embedding_multiplier=float(emb_scale),
            logits_scaling=1.0 / float(out_scale),
            max_position_embeddings=cfg.get("n_positions", 2048),
            tie_word_embeddings=cfg.get("tie_word_embeddings", True),
            eos_token_id=cfg.get("eos_token_id") or 0,
            bos_token_id=cfg.get("bos_token_id") or 0,
        )


_QKV_RX = re.compile(
    r"model\.layers\.(\d+)\.self_attn\.([qkv])_proj\.(weight|bias)")


def _shim(cfg: JaisConfig, get_tensor):
    n_out = cfg.num_attention_heads * cfg.head_dim

    def shim(name: str):
        m = _QKV_RX.fullmatch(name)
        if m:
            i, which, leaf = m.group(1), "qkv".index(m.group(2)), m.group(3)
            fused = np.asarray(get_tensor(
                f"transformer.h.{i}.attn.c_attn.{leaf}"))
            lo, hi = which * n_out, (which + 1) * n_out
            if leaf == "bias":
                return fused[lo:hi]
            # Conv1D stores [in, 3*out]; decoder.stack() transposes
            return fused[:, lo:hi].T
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
                    .replace("mlp.gate_proj.", "mlp.c_fc2.")
                    .replace("mlp.up_proj.", "mlp.c_fc.")
                    .replace("mlp.down_proj.", "mlp.c_proj."))
            w = np.asarray(get_tensor(f"transformer.h.{i}.{rest}"))
            # Conv1D mats are [in, out]; decoder transposes weights back
            if rest.endswith(".weight") and ("c_proj" in rest
                                             or "c_fc" in rest):
                return w.T
            return w
        return get_tensor(name)

    return shim


def params_from_hf_state_dict(cfg: JaisConfig, get_tensor,
                              dtype=jnp.bfloat16, quant=None, **kw):
    if quant is not None:
        raise ValueError("quantized JAIS checkpoints (fused Conv1D) are "
                         "not supported")
    return _dec.params_from_hf_state_dict(cfg, _shim(cfg, get_tensor),
                                          dtype=dtype)
