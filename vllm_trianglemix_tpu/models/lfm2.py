"""LFM2 (Lfm2ForCausalLM): gated short-conv / attention hybrid.

Reference: vllm/model_executor/models/lfm2.py + HF
transformers/models/lfm2/modeling_lfm2.py — ``layer_types`` mixes
"conv" layers (in_proj → (B, C, x); depthwise causal conv over B*x with
an L_cache kernel; y = C * conv_out → out_proj; no activation) with
"full_attention" GQA layers (per-head q/k RMSNorm before full
rotate-half rotary, ``out_proj`` naming); every layer runs a SwiGLU
w1/w3/w2 MLP behind ffn_norm, and the FINAL norm is ``embedding_norm``.
``intermediate_size`` auto-adjusts (2/3 · multiplier, rounded up to
block_multiple_of) when block_auto_adjust_ff_dim.

Cache layout is the Jamba/Bamba two-group scheme: paged KV for
attention layers; each conv layer packs its last L_cache-1 columns of
B*x (fp32, [D, L-1] per request) into group-1 state pages.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from vllm_trianglemix_tpu.attention.backend import (
    padded_head_dim,
    ragged_paged_attention,
    write_kv,
)
from vllm_trianglemix_tpu.layers.common import rms_norm, silu_and_mul
from vllm_trianglemix_tpu.models.bamba import cdiv
from vllm_trianglemix_tpu.models.decoder import apply_rope, rope_cos_sin

SUPPORTS_FUSED_DECODE = False  # python-loop hybrid forward


@dataclass(frozen=True)
class Lfm2Config:
    vocab_size: int = 65_536
    hidden_size: int = 2048
    intermediate_size: int = 12_288
    block_auto_adjust_ff_dim: bool = True
    block_ffn_dim_multiplier: float = 1.0
    block_multiple_of: int = 256
    num_hidden_layers: int = 16
    num_attention_heads: int = 32
    num_key_value_heads: int = 8
    head_dim: int = 64
    layer_types_override: tuple = field(default=())
    rms_norm_eps: float = 1e-5
    rope_theta: float = 1_000_000.0
    conv_L_cache: int = 3
    conv_bias: bool = False
    tie_word_embeddings: bool = True
    max_position_embeddings: int = 128_000
    eos_token_id: int = 7
    bos_token_id: int = 1
    sliding_window: int = 0
    rope_scaling: object = None
    num_experts: int = 0

    @property
    def ff_dim(self) -> int:
        i = self.intermediate_size
        if self.block_auto_adjust_ff_dim:
            i = int(2 * i / 3)
            if self.block_ffn_dim_multiplier is not None:
                i = int(self.block_ffn_dim_multiplier * i)
                m = self.block_multiple_of
                i = m * ((i + m - 1) // m)
        return i

    @property
    def layer_types(self) -> tuple:
        return self.layer_types_override

    @property
    def state_row_width(self) -> int:
        return self.hidden_size * (self.conv_L_cache - 1)

    @classmethod
    def from_hf_config(cls, cfg: dict) -> "Lfm2Config":
        kw = {}
        for k in ("vocab_size", "hidden_size", "intermediate_size",
                  "block_auto_adjust_ff_dim", "block_ffn_dim_multiplier",
                  "block_multiple_of", "num_hidden_layers",
                  "num_attention_heads", "num_key_value_heads",
                  "conv_L_cache", "conv_bias", "rope_theta",
                  "tie_word_embeddings", "max_position_embeddings",
                  "eos_token_id", "bos_token_id"):
            if cfg.get(k) is not None:
                kw[k] = cfg[k]
        kw["rms_norm_eps"] = cfg.get("norm_eps", 1e-5)
        heads = kw.get("num_attention_heads", 32)
        kw["head_dim"] = cfg.get("head_dim") or (
            kw.get("hidden_size", 2048) // heads)
        kw["layer_types_override"] = tuple(cfg.get("layer_types") or ())
        return cls(**kw)

    @classmethod
    def from_pretrained(cls, path: str) -> "Lfm2Config":
        with open(os.path.join(path, "config.json")) as f:
            return cls.from_hf_config(json.load(f))


# --- parameter tree -----------------------------------------------------------

def _layer_shapes(cfg: Lfm2Config, i: int) -> dict:
    D, I = cfg.hidden_size, cfg.ff_dim
    HQ, KH, Dh = (cfg.num_attention_heads, cfg.num_key_value_heads,
                  cfg.head_dim)
    s: dict = {"operator_norm": (D,), "ffn_norm": (D,),
               "gate_proj": (D, I), "up_proj": (D, I),
               "down_proj": (I, D)}
    if cfg.layer_types[i] == "full_attention":
        s.update(q_proj=(D, HQ * Dh), k_proj=(D, KH * Dh),
                 v_proj=(D, KH * Dh), o_proj=(HQ * Dh, D),
                 q_norm=(Dh,), k_norm=(Dh,))
    else:
        s.update(conv_in_proj=(D, 3 * D), conv_w=(D, cfg.conv_L_cache),
                 conv_out_proj=(D, D))
        if cfg.conv_bias:
            s.update(conv_in_bias=(3 * D,), conv_b=(D,),
                     conv_out_bias=(D,))
    return s


def shape_tree(cfg: Lfm2Config) -> dict:
    tree = {
        "embed_tokens": (cfg.vocab_size, cfg.hidden_size),
        "layers": [_layer_shapes(cfg, i)
                   for i in range(cfg.num_hidden_layers)],
        "norm": (cfg.hidden_size,),
    }
    if not cfg.tie_word_embeddings:
        tree["lm_head"] = (cfg.hidden_size, cfg.vocab_size)
    return tree


def partition_specs(cfg: Lfm2Config, quantized=None) -> dict:
    return jax.tree_util.tree_map(lambda s: P(*([None] * len(s))),
                                  shape_tree(cfg),
                                  is_leaf=lambda x: isinstance(x, tuple))


def init_random(cfg: Lfm2Config, seed: int = 0, dtype=jnp.bfloat16):
    shapes = shape_tree(cfg)
    leaves, treedef = jax.tree_util.tree_flatten(
        shapes, is_leaf=lambda x: isinstance(x, tuple))
    keys = jax.random.split(jax.random.PRNGKey(seed), len(leaves))
    vals = [(jax.random.normal(k, s, jnp.float32) * 0.02).astype(dtype)
            for k, s in zip(keys, leaves)]
    return jax.tree_util.tree_unflatten(treedef, vals)


def params_from_hf_state_dict(cfg: Lfm2Config, get_tensor,
                              dtype=jnp.bfloat16, quant=None, **kw):
    if quant is not None:
        raise ValueError("quantized LFM2 checkpoints are not supported")

    def t(name, transpose=False):
        w = np.asarray(get_tensor(name))
        return jnp.asarray(w.T if transpose else w, dtype=dtype)

    layers = []
    for i in range(cfg.num_hidden_layers):
        p = f"model.layers.{i}"
        lp = {
            "operator_norm": t(f"{p}.operator_norm.weight"),
            "ffn_norm": t(f"{p}.ffn_norm.weight"),
            "gate_proj": t(f"{p}.feed_forward.w1.weight", True),
            "up_proj": t(f"{p}.feed_forward.w3.weight", True),
            "down_proj": t(f"{p}.feed_forward.w2.weight", True),
        }
        if cfg.layer_types[i] == "full_attention":
            lp.update(
                q_proj=t(f"{p}.self_attn.q_proj.weight", True),
                k_proj=t(f"{p}.self_attn.k_proj.weight", True),
                v_proj=t(f"{p}.self_attn.v_proj.weight", True),
                o_proj=t(f"{p}.self_attn.out_proj.weight", True),
                q_norm=t(f"{p}.self_attn.q_layernorm.weight"),
                k_norm=t(f"{p}.self_attn.k_layernorm.weight"),
            )
        else:
            lp.update(
                conv_in_proj=t(f"{p}.conv.in_proj.weight", True),
                conv_w=jnp.asarray(
                    np.asarray(get_tensor(f"{p}.conv.conv.weight"))[:, 0],
                    dtype),
                conv_out_proj=t(f"{p}.conv.out_proj.weight", True),
            )
            if cfg.conv_bias:
                lp.update(
                    conv_in_bias=t(f"{p}.conv.in_proj.bias"),
                    conv_b=t(f"{p}.conv.conv.bias"),
                    conv_out_bias=t(f"{p}.conv.out_proj.bias"),
                )
        layers.append(lp)

    params = {
        "embed_tokens": t("model.embed_tokens.weight"),
        "layers": layers,
        "norm": t("model.embedding_norm.weight"),
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = t("lm_head.weight", True)
    return params


# --- forward ------------------------------------------------------------------

def _short_conv(lp, h, conv_hist, rq, off, li, *, D: int, K: int):
    """Gated short conv: (B, C, x) split; depthwise causal conv over
    B*x with cached history; y = C * conv_out. Returns (out [T, D],
    hist_new [R, D, K-1])."""
    T = h.shape[0]
    bcx = h @ lp["conv_in_proj"]
    if "conv_in_bias" in lp:
        bcx = bcx + lp["conv_in_bias"]
    B, C, x_ = bcx[:, :D], bcx[:, D:2 * D], bcx[:, 2 * D:]
    bx = (B * x_).astype(jnp.float32)

    taps = [bx]
    acc = bx * lp["conv_w"][:, K - 1].astype(jnp.float32)
    for d in range(1, K):
        shifted = jnp.concatenate(
            [jnp.zeros((d, D), jnp.float32), bx], axis=0)[:T]
        hidx = jnp.clip(K - 1 - d + off, 0, K - 2)
        hval = jnp.take_along_axis(
            conv_hist[rq], hidx[:, None, None], axis=2)[:, :, 0]
        xd = jnp.where((off >= d)[:, None], shifted, hval)
        taps.append(xd)
        acc = acc + xd * lp["conv_w"][:, K - 1 - d].astype(jnp.float32)
    if "conv_b" in lp:
        acc = acc + lp["conv_b"].astype(jnp.float32)
    hist_new = jnp.stack(
        [taps[d][li] for d in range(K - 2, -1, -1)], axis=2)

    y = C.astype(jnp.float32) * acc
    out = y.astype(h.dtype) @ lp["conv_out_proj"]
    if "conv_out_bias" in lp:
        out = out + lp["conv_out_bias"]
    return out, hist_new


def forward(params, cfg: Lfm2Config, tri_cfg, token_ids, kv_caches,
            md, tri_flags, lora=None, kv_quant=None, moe_fn=None,
            fused_decode=False):
    assert not fused_decode, "LFM2 fused-decode path not implemented"
    del tri_cfg, tri_flags, lora, kv_quant, moe_fn
    T = token_ids.shape[0]
    HQ, KH, Dh = (cfg.num_attention_heads, cfg.num_key_value_heads,
                  cfg.head_dim)
    D, K = cfg.hidden_size, cfg.conv_L_cache
    eps = cfg.rms_norm_eps
    scale = Dh ** -0.5
    W = cfg.state_row_width
    num_blocks, page = kv_caches.shape[1], kv_caches.shape[2]
    pe = page * kv_caches.shape[3] * kv_caches.shape[4]
    S = cdiv(W, pe)

    if md.block_tables_g is not None:
        md0 = md._replace(block_tables=md.block_tables_g[0],
                          slot_mapping=md.slot_mapping_g[0],
                          kv_slices=None, num_kv_slices=None)
        bt1 = md.block_tables_g[1]
    else:
        md0, bt1 = md, md.block_tables
    stabs = bt1[:, :S]
    R = stabs.shape[0]

    rq = md.req_idx
    qsl = md.query_start_loc
    off = jnp.arange(T, dtype=jnp.int32) - qsl[rq]
    span = qsl[1:] - qsl[:-1]
    li = jnp.clip(qsl[:-1] + jnp.maximum(span, 1) - 1, 0, T - 1)
    has_tokens = span > 0

    x = params["embed_tokens"][token_ids]
    cos, sin = rope_cos_sin(md.positions, Dh, cfg.rope_theta,
                            dtype=x.dtype,
                            max_position_embeddings=(
                                cfg.max_position_embeddings))
    new_kvs = []
    for i, lp in enumerate(params["layers"]):
        kv_l = kv_caches[i]
        h = rms_norm(x, lp["operator_norm"], eps)
        if cfg.layer_types[i] == "full_attention":
            q = (h @ lp["q_proj"]).reshape(T, HQ, Dh)
            k = (h @ lp["k_proj"]).reshape(T, KH, Dh)
            v = (h @ lp["v_proj"]).reshape(T, KH, Dh)
            q = rms_norm(q, lp["q_norm"], eps)
            k = rms_norm(k, lp["k_norm"], eps)
            q, k = apply_rope(q, k, cos, sin)
            kv_l = write_kv(kv_l, k, v, md0)
            a = ragged_paged_attention(q, kv_l, md0, False, scale=scale,
                                       tri_enabled=False)
            out = a.reshape(T, HQ * Dh) @ lp["o_proj"]
        else:
            rows = kv_l[stabs].reshape(R, -1)[:, :W].astype(jnp.float32)
            conv_hist = rows.reshape(R, D, K - 1)
            out, hist_new = _short_conv(lp, h, conv_hist, rq, off, li,
                                        D=D, K=K)
            rows_new = jnp.pad(hist_new.reshape(R, -1),
                               ((0, 0), (0, S * pe - W)))
            chunks = rows_new.reshape(
                R, S, page, kv_caches.shape[3],
                kv_caches.shape[4]).astype(kv_l.dtype)
            safe = jnp.where(has_tokens[:, None], stabs, num_blocks)
            kv_l = kv_l.at[safe].set(chunks, mode="drop")
        x = x + out
        h2 = rms_norm(x, lp["ffn_norm"], eps)
        x = x + silu_and_mul(h2 @ lp["gate_proj"],
                             h2 @ lp["up_proj"]) @ lp["down_proj"]
        new_kvs.append(kv_l)
    x = rms_norm(x, params["norm"], eps)
    return x, jnp.stack(new_kvs)


def compute_logits(params, cfg: Lfm2Config, hidden):
    w = (params["embed_tokens"].T if cfg.tie_word_embeddings
         else params["lm_head"])
    return jnp.dot(hidden, w, preferred_element_type=jnp.float32)


# --- KV cache declaration -----------------------------------------------------

def kv_cache_group_specs(cfg: Lfm2Config, block_size: int,
                         dtype_bytes: int = 2):
    from vllm_trianglemix_tpu.core.kv_cache_interface import (
        FullAttentionSpec,
        KVCacheGroupSpec,
        MambaPagesSpec,
    )
    common = dict(block_size=block_size,
                  num_kv_heads=cfg.num_key_value_heads,
                  head_size=padded_head_dim(cfg.head_dim),
                  dtype_bytes=dtype_bytes)
    pe = block_size * 2 * cfg.num_key_value_heads * padded_head_dim(
        cfg.head_dim)
    return [
        KVCacheGroupSpec(("full_attention",), FullAttentionSpec(**common)),
        KVCacheGroupSpec(
            ("conv",),
            MambaPagesSpec(**common,
                           num_state_pages=cdiv(cfg.state_row_width, pe))),
    ]


def kv_cache_spec(cfg: Lfm2Config, block_size: int, dtype_bytes: int = 2):
    return kv_cache_group_specs(cfg, block_size, dtype_bytes)[0] \
        .kv_cache_spec
