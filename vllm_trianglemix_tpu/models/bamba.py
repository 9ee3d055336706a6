"""Bamba (BambaForCausalLM): Mamba-2 / attention hybrid.

Reference: vllm/model_executor/models/bamba.py + HF
transformers/models/bamba/modeling_bamba.py — mostly-Mamba-2 layers with
a few interleaved GQA attention layers (``attn_layer_indices``), every
layer followed by a dense SwiGLU MLP behind its own pre_ff_layernorm.
Attention layers use partial rotary (0.5, rotate-half); Mamba-2 layers
run the exact SSD mixer shared with models/mamba2.py (mamba2_mixer).

Cache layout is Jamba's two-group scheme (models/jamba.py): attention
layers use normal paged KV through group 0; every Mamba layer packs its
fp32 conv history + [H, P, N] SSD state into a fixed set of group-1
pages per request.
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
from vllm_trianglemix_tpu.models.decoder import apply_rope, rope_cos_sin
from vllm_trianglemix_tpu.models.mamba2 import mamba2_mixer


def cdiv(a: int, b: int) -> int:
    return -(-a // b)

SUPPORTS_FUSED_DECODE = False  # python-loop hybrid forward


@dataclass(frozen=True)
class BambaConfig:
    vocab_size: int = 128_000
    hidden_size: int = 4096
    intermediate_size: int = 14336
    num_hidden_layers: int = 32
    num_attention_heads: int = 32
    num_key_value_heads: int = 8
    attn_layer_indices: tuple = ()
    rms_norm_eps: float = 1e-5
    rope_theta: float = 10_000.0
    partial_rotary_factor: float = 0.5
    mamba_n_heads: int = 128
    mamba_d_head: int = 64
    mamba_d_state: int = 128
    mamba_n_groups: int = 1
    mamba_expand: int = 2
    mamba_d_conv: int = 4
    mamba_conv_bias: bool = True
    mamba_proj_bias: bool = False
    tie_word_embeddings: bool = False
    max_position_embeddings: int = 262_144
    eos_token_id: int = 0
    bos_token_id: int = 1
    sliding_window: int = 0
    rope_scaling: object = None
    num_experts: int = 0
    layer_types_override: tuple = field(default=())

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads

    @property
    def d_inner(self) -> int:
        return self.mamba_expand * self.hidden_size

    @property
    def conv_dim(self) -> int:
        return (self.d_inner
                + 2 * self.mamba_n_groups * self.mamba_d_state)

    @property
    def layer_types(self) -> tuple:
        if self.layer_types_override:
            return self.layer_types_override
        return tuple("attention" if i in set(self.attn_layer_indices)
                     else "mamba"
                     for i in range(self.num_hidden_layers))

    @property
    def state_row_width(self) -> int:
        return (self.conv_dim * (self.mamba_d_conv - 1)
                + self.mamba_n_heads * self.mamba_d_head
                * self.mamba_d_state)

    @classmethod
    def from_hf_config(cls, cfg: dict) -> "BambaConfig":
        kw = {}
        for k in ("vocab_size", "hidden_size", "intermediate_size",
                  "num_hidden_layers", "num_attention_heads",
                  "num_key_value_heads", "rms_norm_eps", "rope_theta",
                  "partial_rotary_factor", "mamba_n_heads",
                  "mamba_d_head", "mamba_d_state", "mamba_n_groups",
                  "mamba_expand", "mamba_d_conv", "mamba_conv_bias",
                  "mamba_proj_bias", "tie_word_embeddings",
                  "max_position_embeddings", "eos_token_id",
                  "bos_token_id"):
            if cfg.get(k) is not None:
                kw[k] = cfg[k]
        if cfg.get("attn_layer_indices"):
            kw["attn_layer_indices"] = tuple(cfg["attn_layer_indices"])
        elif cfg.get("layers_block_type"):
            kw["layer_types_override"] = tuple(cfg["layers_block_type"])
        return cls(**kw)

    @classmethod
    def from_pretrained(cls, path: str) -> "BambaConfig":
        with open(os.path.join(path, "config.json")) as f:
            return cls.from_hf_config(json.load(f))


# --- parameter tree -----------------------------------------------------------

def _layer_shapes(cfg: BambaConfig, i: int) -> dict:
    D, I = cfg.hidden_size, cfg.intermediate_size
    HQ, KH, Dh = (cfg.num_attention_heads, cfg.num_key_value_heads,
                  cfg.head_dim)
    din, cd = cfg.d_inner, cfg.conv_dim
    H, K = cfg.mamba_n_heads, cfg.mamba_d_conv
    s: dict = {"input_layernorm": (D,), "pre_ff_layernorm": (D,),
               "gate_proj": (D, I), "up_proj": (D, I),
               "down_proj": (I, D)}
    if cfg.layer_types[i] == "attention":
        s.update(q_proj=(D, HQ * Dh), k_proj=(D, KH * Dh),
                 v_proj=(D, KH * Dh), o_proj=(HQ * Dh, D))
    else:
        s.update(in_proj=(D, din + cd + H),
                 conv_w=(cd, K), dt_bias=(H,), A_log=(H,), D=(H,),
                 gated_norm=(din,), out_proj=(din, D))
        if cfg.mamba_conv_bias:
            s["conv_b"] = (cd,)
    return s


def shape_tree(cfg: BambaConfig) -> dict:
    tree = {
        "embed_tokens": (cfg.vocab_size, cfg.hidden_size),
        "layers": [_layer_shapes(cfg, i)
                   for i in range(cfg.num_hidden_layers)],
        "norm": (cfg.hidden_size,),
    }
    if not cfg.tie_word_embeddings:
        tree["lm_head"] = (cfg.hidden_size, cfg.vocab_size)
    return tree


def partition_specs(cfg: BambaConfig, quantized=None) -> dict:
    return jax.tree_util.tree_map(lambda s: P(*([None] * len(s))),
                                  shape_tree(cfg),
                                  is_leaf=lambda x: isinstance(x, tuple))


def init_random(cfg: BambaConfig, seed: int = 0, dtype=jnp.bfloat16):
    shapes = shape_tree(cfg)
    leaves, treedef = jax.tree_util.tree_flatten(
        shapes, is_leaf=lambda x: isinstance(x, tuple))
    keys = jax.random.split(jax.random.PRNGKey(seed), len(leaves))
    vals = [(jax.random.normal(k, s, jnp.float32) * 0.02).astype(dtype)
            for k, s in zip(keys, leaves)]
    return jax.tree_util.tree_unflatten(treedef, vals)


def params_from_hf_state_dict(cfg: BambaConfig, get_tensor,
                              dtype=jnp.bfloat16, quant=None, **kw):
    if quant is not None:
        raise ValueError("quantized Bamba checkpoints are not supported")

    def t(name, transpose=False):
        w = np.asarray(get_tensor(name))
        return jnp.asarray(w.T if transpose else w, dtype=dtype)

    layers = []
    for i in range(cfg.num_hidden_layers):
        p = f"model.layers.{i}"
        lp = {
            "input_layernorm": t(f"{p}.input_layernorm.weight"),
            "pre_ff_layernorm": t(f"{p}.pre_ff_layernorm.weight"),
        }
        if cfg.layer_types[i] == "attention":
            for k in ("q_proj", "k_proj", "v_proj", "o_proj"):
                lp[k] = t(f"{p}.self_attn.{k}.weight", True)
        else:
            m = f"{p}.mamba"
            lp.update(
                in_proj=t(f"{m}.in_proj.weight", True),
                conv_w=jnp.asarray(
                    np.asarray(get_tensor(f"{m}.conv1d.weight"))[:, 0, :],
                    dtype),
                dt_bias=t(f"{m}.dt_bias"),
                A_log=t(f"{m}.A_log"),
                D=t(f"{m}.D"),
                gated_norm=t(f"{m}.norm.weight"),
                out_proj=t(f"{m}.out_proj.weight", True),
            )
            if cfg.mamba_conv_bias:
                lp["conv_b"] = t(f"{m}.conv1d.bias")
        for k in ("gate_proj", "up_proj", "down_proj"):
            lp[k] = t(f"{p}.feed_forward.{k}.weight", True)
        layers.append(lp)

    params = {
        "embed_tokens": t("model.embed_tokens.weight"),
        "layers": layers,
        "norm": t("model.final_layernorm.weight"),
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = t("lm_head.weight", True)
    return params


# --- forward ------------------------------------------------------------------

def forward(params, cfg: BambaConfig, tri_cfg, token_ids, kv_caches,
            md, tri_flags, lora=None, kv_quant=None, moe_fn=None,
            fused_decode=False):
    assert not fused_decode, "Bamba fused-decode path not implemented"
    del tri_cfg, tri_flags, lora, kv_quant, moe_fn
    T = token_ids.shape[0]
    HQ, KH, Dh = (cfg.num_attention_heads, cfg.num_key_value_heads,
                  cfg.head_dim)
    H, P_, N = cfg.mamba_n_heads, cfg.mamba_d_head, cfg.mamba_d_state
    G = cfg.mamba_n_groups
    din, cd, K = cfg.d_inner, cfg.conv_dim, cfg.mamba_d_conv
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
    else:  # single-group callers (unit tests with disjoint tables)
        md0, bt1 = md, md.block_tables
    stabs = bt1[:, :S]
    R = stabs.shape[0]

    rq = md.req_idx
    qsl = md.query_start_loc
    off = jnp.arange(T, dtype=jnp.int32) - qsl[rq]
    is_start = off == 0
    span = qsl[1:] - qsl[:-1]
    li = jnp.clip(qsl[:-1] + jnp.maximum(span, 1) - 1, 0, T - 1)
    has_tokens = span > 0

    x = params["embed_tokens"][token_ids]
    rot_dim = int(Dh * cfg.partial_rotary_factor) // 2 * 2
    cos, sin = rope_cos_sin(md.positions, rot_dim, cfg.rope_theta,
                            dtype=x.dtype,
                            max_position_embeddings=(
                                cfg.max_position_embeddings))
    new_kvs = []
    for i, lp in enumerate(params["layers"]):
        kv_l = kv_caches[i]
        h = rms_norm(x, lp["input_layernorm"], eps)
        if cfg.layer_types[i] == "attention":
            q = (h @ lp["q_proj"]).reshape(T, HQ, Dh)
            k = (h @ lp["k_proj"]).reshape(T, KH, Dh)
            v = (h @ lp["v_proj"]).reshape(T, KH, Dh)
            q, k = apply_rope(q, k, cos, sin)
            kv_l = write_kv(kv_l, k, v, md0)
            a = ragged_paged_attention(q, kv_l, md0, False, scale=scale,
                                       tri_enabled=False)
            out = a.reshape(T, HQ * Dh) @ lp["o_proj"]
        else:
            rows = kv_l[stabs].reshape(R, -1)[:, :W].astype(jnp.float32)
            conv_hist = rows[:, :cd * (K - 1)].reshape(R, cd, K - 1)
            ssm0 = rows[:, cd * (K - 1):].reshape(R, H, P_, N)
            out, hist_new, ssm_new = mamba2_mixer(
                lp, h, conv_hist, ssm0, rq, off, is_start, li,
                H=H, P_=P_, N=N, G=G, din=din, cd=cd, K=K, eps=eps)
            rows_new = jnp.concatenate(
                [hist_new.reshape(R, -1), ssm_new.reshape(R, -1)], axis=1)
            rows_new = jnp.pad(rows_new, ((0, 0), (0, S * pe - W)))
            chunks = rows_new.reshape(
                R, S, page, kv_caches.shape[3],
                kv_caches.shape[4]).astype(kv_l.dtype)
            safe = jnp.where(has_tokens[:, None], stabs, num_blocks)
            kv_l = kv_l.at[safe].set(chunks, mode="drop")
        x = x + out
        h2 = rms_norm(x, lp["pre_ff_layernorm"], eps)
        x = x + silu_and_mul(h2 @ lp["gate_proj"],
                             h2 @ lp["up_proj"]) @ lp["down_proj"]
        new_kvs.append(kv_l)
    x = rms_norm(x, params["norm"], eps)
    return x, jnp.stack(new_kvs)


def compute_logits(params, cfg: BambaConfig, hidden):
    w = (params["embed_tokens"].T if cfg.tie_word_embeddings
         else params["lm_head"])
    return jnp.dot(hidden, w, preferred_element_type=jnp.float32)


# --- KV cache declaration -----------------------------------------------------

def kv_cache_group_specs(cfg: BambaConfig, block_size: int,
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
        KVCacheGroupSpec(("attention",), FullAttentionSpec(**common)),
        KVCacheGroupSpec(
            ("mamba",),
            MambaPagesSpec(**common,
                           num_state_pages=cdiv(cfg.state_row_width, pe))),
    ]


def kv_cache_spec(cfg: BambaConfig, block_size: int, dtype_bytes: int = 2):
    return kv_cache_group_specs(cfg, block_size, dtype_bytes)[0] \
        .kv_cache_spec
