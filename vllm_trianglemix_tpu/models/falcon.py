"""Falcon (7B MQA / 40B new-decoder-architecture): parallel blocks +
fused grouped qkv.

Reference: vllm/model_executor/models/falcon.py + HF
transformers/models/falcon/modeling_falcon.py — parallel attn+MLP
residual; 7B: multi-query (1 KV head), ONE shared input LayerNorm;
40B+: grouped KV with per-group (q..., k, v) fused rows and separate
ln_attn / ln_mlp norms. Non-gated GELU MLP, bias-free projections,
rope. falcon-rw (alibi=True, parallel_attn=False) runs the SERIAL
block with ALiBi score biases on the XLA attention path.
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


def _falcon_slopes(heads: int, head_dim: int) -> tuple:
    """Falcon folds 1/sqrt(head_dim) INTO the ALiBi bias (HF falcon
    scales alibi with the scores, reference falcon.py:171 multiplies the
    slopes by inv_norm_factor) and HF builds the bias from
    bfloat16-rounded slopes — both matched here for token parity."""
    import math

    import ml_dtypes

    s = np.asarray(decoder.alibi_slopes_closest_pow2(heads), np.float32)
    s = s.astype(ml_dtypes.bfloat16).astype(np.float32)
    return tuple(float(x) / math.sqrt(head_dim) for x in s)


@dataclass(frozen=True)
class FalconConfig(DecoderConfig):
    norm_type: str = "layernorm"
    gated_mlp: bool = False
    hidden_act: str = "gelu"
    parallel_block: bool = True
    parallel_block_shared_norm: bool = True   # 7B; 40B sets False
    tie_word_embeddings: bool = True
    rope_theta: float = 10_000.0
    eos_token_id: int = 11
    bos_token_id: int = 11
    # checkpoint layout switch (not a compute knob)
    new_decoder_architecture: bool = False

    @classmethod
    def from_hf_config(cls, cfg) -> "FalconConfig":
        d = dict(cfg)
        # falcon-rw: alibi=True + parallel_attn=False — a SERIAL block
        # (input_layernorm -> attn, post_attention_layernorm -> MLP) with
        # Bloom-style closest-pow2 ALiBi slopes (HF build_alibi_tensor),
        # served via the XLA attention path.
        alibi = bool(d.get("alibi", False))
        parallel = bool(d.get("parallel_attn", True))
        heads = d["num_attention_heads"]
        hidden = d["hidden_size"]
        new_arch = bool(d.get("new_decoder_architecture", False))
        if new_arch:
            kv = d.get("num_kv_heads") or heads
        elif d.get("multi_query", True):
            kv = 1
        else:
            kv = heads
        return cls(
            vocab_size=d["vocab_size"],
            hidden_size=hidden,
            intermediate_size=d.get("ffn_hidden_size") or 4 * hidden,
            num_hidden_layers=d["num_hidden_layers"],
            num_attention_heads=heads,
            num_key_value_heads=kv,
            head_dim=hidden // heads,
            rms_norm_eps=d.get("layer_norm_epsilon", 1e-5),
            rope_theta=d.get("rope_theta", 10_000.0),
            use_qkv_bias=bool(d.get("bias", False)),
            use_o_bias=bool(d.get("bias", False)),
            use_mlp_bias=bool(d.get("bias", False)),
            use_rope=not alibi,
            alibi_slopes=(_falcon_slopes(heads, hidden // heads)
                          if alibi else None),
            parallel_block=parallel,
            parallel_block_shared_norm=parallel and not new_arch,
            new_decoder_architecture=new_arch,
            max_position_embeddings=d.get("max_position_embeddings", 2048),
            tie_word_embeddings=d.get("tie_word_embeddings", True),
            eos_token_id=d.get("eos_token_id", 11),
            bos_token_id=d.get("bos_token_id", 11),
        )


_RX = re.compile(r"model\.layers\.(\d+)\.(.+)")
_QKV = re.compile(r"self_attn\.([qkv])_proj\.(weight|bias)")


def _split_qkv(cfg: FalconConfig, fused: np.ndarray, which: str
               ) -> np.ndarray:
    """Split Falcon's fused query_key_value rows into q/k/v."""
    HQ, KH, Dh = (cfg.num_attention_heads, cfg.num_key_value_heads,
                  cfg.head_dim)
    tail = fused.shape[1:]  # (D,) for weights, () for biases
    if cfg.new_decoder_architecture:
        # per-KV-group blocks: (q * HQ/KH, k, v)
        g = fused.reshape((KH, HQ // KH + 2, Dh) + tail)
        if which == "q":
            return g[:, :-2].reshape((HQ * Dh,) + tail)
        sel = -2 if which == "k" else -1
        return g[:, sel].reshape((KH * Dh,) + tail)
    if KH == 1:
        # 7B multi-query: q rows then one k head then one v head
        if which == "q":
            return fused[:HQ * Dh]
        if which == "k":
            return fused[HQ * Dh:(HQ + 1) * Dh]
        return fused[(HQ + 1) * Dh:]
    # falcon-rw-style per-head interleave (KH == HQ)
    g = fused.reshape((HQ, 3, Dh) + tail)
    return g[:, "qkv".index(which)].reshape((HQ * Dh,) + tail)


def _shim(cfg: FalconConfig, get_tensor):
    new_arch = cfg.new_decoder_architecture
    ln_attn = "ln_attn" if new_arch else "input_layernorm"
    # 40B two-norm parallel block stores the MLP norm as ln_mlp;
    # falcon-rw's serial block uses the standard name.
    ln_mlp = "ln_mlp" if cfg.parallel_block else "post_attention_layernorm"

    def shim(name: str):
        top = {
            "model.embed_tokens.weight": "transformer.word_embeddings.weight",
            "model.norm.weight": "transformer.ln_f.weight",
            "model.norm.bias": "transformer.ln_f.bias",
            "lm_head.weight": "lm_head.weight",
        }
        if name in top:
            return get_tensor(top[name])
        m = _RX.fullmatch(name)
        assert m, name
        i, leaf = m.group(1), m.group(2)
        h = f"transformer.h.{i}"
        qm = _QKV.fullmatch(leaf)
        if qm:
            fused = np.asarray(get_tensor(
                f"{h}.self_attention.query_key_value.{qm.group(2)}"))
            return _split_qkv(cfg, fused, qm.group(1))
        table = {
            "input_layernorm.weight": f"{h}.{ln_attn}.weight",
            "input_layernorm.bias": f"{h}.{ln_attn}.bias",
            "post_attention_layernorm.weight": f"{h}.{ln_mlp}.weight",
            "post_attention_layernorm.bias": f"{h}.{ln_mlp}.bias",
            "self_attn.o_proj.weight": f"{h}.self_attention.dense.weight",
            "self_attn.o_proj.bias": f"{h}.self_attention.dense.bias",
            "mlp.up_proj.weight": f"{h}.mlp.dense_h_to_4h.weight",
            "mlp.up_proj.bias": f"{h}.mlp.dense_h_to_4h.bias",
            "mlp.down_proj.weight": f"{h}.mlp.dense_4h_to_h.weight",
            "mlp.down_proj.bias": f"{h}.mlp.dense_4h_to_h.bias",
        }
        return get_tensor(table[leaf])

    return shim


def params_from_hf_state_dict(cfg: FalconConfig, get_tensor,
                              dtype=jnp.bfloat16, quant=None, **kw):
    if quant is not None:
        raise ValueError("quantized Falcon checkpoints (fused grouped "
                         "layouts) are not supported yet")
    return decoder.params_from_hf_state_dict(
        cfg, _shim(cfg, get_tensor), dtype=dtype, **kw)
