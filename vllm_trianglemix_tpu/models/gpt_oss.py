"""GPT-OSS: MoE with attention sinks + alternating sliding/full layers.

Reference: vllm/model_executor/models/gpt_oss.py + HF
transformers/models/gpt_oss/modeling_gpt_oss.py. Numerics matched:

- Attention: biased q/k/v/o, per-layer learned SINK logits [HQ] — an
  extra softmax column that absorbs probability mass and is dropped from
  the value sum (the attention backend's ``sinks`` argument implements
  exactly this); yarn rope with truncate=False; ``layer_types``
  alternate sliding_attention / full_attention, served through the same
  per-group KV machinery as Gemma-2 (period-chunked layer scan, one KV
  cache group per attention type).
- MoE: router linear WITH bias, top-k selection then softmax over the
  selected logits; experts hold FUSED gate_up [E, D, 2I] with gate/up
  INTERLEAVED on the last axis, per-expert biases, and the clamped
  activation glu = clamp(gate) * sigmoid(1.702 * gate),
  out = (clamp(up) + 1) * glu (swiglu_limit). Routed rows run as
  ``lax.ragged_dot`` grouped GEMMs like the shared decoder's MoE.

Real GPT-OSS checkpoints ship mxfp4 expert weights; this ingests the
dequantized (bf16/fp32) export — mxfp4 unpacking is future work.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from vllm_trianglemix_tpu.attention.backend import (
    padded_head_dim,
    ragged_paged_attention,
    write_kv,
)
from vllm_trianglemix_tpu.layers.common import (
    apply_rope,
    rms_norm,
    rope_cos_sin,
)
from vllm_trianglemix_tpu.models.decoder import RopeScalingConfig
from vllm_trianglemix_tpu.models.gemma2 import _min_period


SUPPORTS_FUSED_DECODE = False  # custom forward, no fused-decode path


@dataclass(frozen=True)
class GptOssConfig:
    vocab_size: int = 201088
    hidden_size: int = 2880
    intermediate_size: int = 2880
    num_hidden_layers: int = 24
    num_attention_heads: int = 64
    num_key_value_heads: int = 8
    head_dim: int = 64
    num_local_experts: int = 32
    num_experts_per_tok: int = 4
    sliding_window: int = 128
    swiglu_limit: float = 7.0
    rms_norm_eps: float = 1e-5
    rope_theta: float = 150_000.0
    rope_scaling: Any = None
    max_position_embeddings: int = 131072
    tie_word_embeddings: bool = False
    layer_types: tuple = ()
    eos_token_id: int = 200002
    bos_token_id: int = 199998
    num_experts: int = 0    # engine-facing (EP path not wired; 0 = off)

    def __post_init__(self):
        if not self.layer_types:
            object.__setattr__(self, "layer_types", tuple(
                "sliding_attention" if i % 2 == 0 else "full_attention"
                for i in range(self.num_hidden_layers)))

    @property
    def period(self) -> int:
        return _min_period(self.layer_types)

    @property
    def group_order(self) -> list[str]:
        seen = []
        for t in self.layer_types:
            if t not in seen:
                seen.append(t)
        return seen

    @classmethod
    def from_hf_config(cls, cfg: dict) -> "GptOssConfig":
        keys = ["vocab_size", "hidden_size", "intermediate_size",
                "num_hidden_layers", "num_attention_heads",
                "num_key_value_heads", "head_dim", "num_local_experts",
                "num_experts_per_tok", "sliding_window", "swiglu_limit",
                "rms_norm_eps", "rope_theta", "max_position_embeddings",
                "eos_token_id", "bos_token_id"]
        kw = {k: cfg[k] for k in keys if cfg.get(k) is not None}
        if cfg.get("experts_per_token") is not None:
            kw["num_experts_per_tok"] = cfg["experts_per_token"]
        if cfg.get("layer_types"):
            kw["layer_types"] = tuple(cfg["layer_types"])
        kw["rope_scaling"] = RopeScalingConfig.from_hf(
            cfg.get("rope_scaling"))
        kw["tie_word_embeddings"] = bool(
            cfg.get("tie_word_embeddings", False))
        return cls(**kw)

    @classmethod
    def from_pretrained(cls, path: str) -> "GptOssConfig":
        with open(os.path.join(path, "config.json")) as f:
            return cls.from_hf_config(json.load(f))


def kv_cache_group_specs(cfg: GptOssConfig, block_size: int,
                         dtype_bytes: int = 2):
    from vllm_trianglemix_tpu.core.kv_cache_interface import (
        FullAttentionSpec,
        KVCacheGroupSpec,
        SlidingWindowSpec,
    )

    out = []
    for t in cfg.group_order:
        layers = tuple(str(i) for i, lt in enumerate(cfg.layer_types)
                       if lt == t)
        if t == "sliding_attention":
            spec = SlidingWindowSpec(
                block_size=block_size,
                num_kv_heads=cfg.num_key_value_heads,
                head_size=padded_head_dim(cfg.head_dim),
                dtype_bytes=dtype_bytes,
                sliding_window=cfg.sliding_window)
        else:
            spec = FullAttentionSpec(
                block_size=block_size,
                num_kv_heads=cfg.num_key_value_heads,
                head_size=padded_head_dim(cfg.head_dim),
                dtype_bytes=dtype_bytes)
        out.append(KVCacheGroupSpec(layers, spec))
    return out


def kv_cache_spec(cfg: GptOssConfig, block_size: int, dtype_bytes: int = 2):
    from vllm_trianglemix_tpu.core.kv_cache_interface import (
        FullAttentionSpec,
    )

    return FullAttentionSpec(block_size=block_size,
                             num_kv_heads=cfg.num_key_value_heads,
                             head_size=padded_head_dim(cfg.head_dim),
                             dtype_bytes=dtype_bytes)


def shape_tree(cfg: GptOssConfig) -> dict:
    L, D = cfg.num_hidden_layers, cfg.hidden_size
    HQ, KH, Dh = (cfg.num_attention_heads, cfg.num_key_value_heads,
                  cfg.head_dim)
    E, I = cfg.num_local_experts, cfg.intermediate_size
    layers = {
        "input_layernorm": (L, D),
        "q_proj": (L, D, HQ * Dh), "q_bias": (L, HQ * Dh),
        "k_proj": (L, D, KH * Dh), "k_bias": (L, KH * Dh),
        "v_proj": (L, D, KH * Dh), "v_bias": (L, KH * Dh),
        "o_proj": (L, HQ * Dh, D), "o_bias": (L, D),
        "sinks": (L, HQ),
        "post_attention_layernorm": (L, D),
        "router_w": (L, D, E), "router_b": (L, E),
        "gate_up": (L, E, D, 2 * I), "gate_up_b": (L, E, 2 * I),
        "down": (L, E, I, D), "down_b": (L, E, D),
    }
    tree = {"embed_tokens": (cfg.vocab_size, D), "layers": layers,
            "norm": (D,)}
    if not cfg.tie_word_embeddings:
        tree["lm_head"] = (D, cfg.vocab_size)
    return tree


def init_random(cfg: GptOssConfig, seed: int = 0,
                dtype=jnp.bfloat16) -> dict:
    shapes = shape_tree(cfg)
    leaves, treedef = jax.tree_util.tree_flatten(
        shapes, is_leaf=lambda x: isinstance(x, tuple))
    keys = jax.random.split(jax.random.PRNGKey(seed), len(leaves))

    def init_one(key, shape):
        if (len(shape) <= 2 and shape[-1] == cfg.hidden_size
                and shape[0] != cfg.vocab_size):
            return jnp.ones(shape, dtype)
        return (jax.random.normal(key, shape, jnp.float32) * 0.02).astype(
            dtype)

    return jax.tree_util.tree_unflatten(
        treedef, [init_one(k, s) for k, s in zip(keys, leaves)])


def params_from_hf_state_dict(cfg: GptOssConfig, get_tensor,
                              dtype=jnp.bfloat16, quant=None) -> dict:
    if quant is not None:
        raise ValueError("quantized (mxfp4) GPT-OSS checkpoints are not "
                         "wired yet; export dequantized weights")
    L = cfg.num_hidden_layers

    def stack(sub: str, transpose: bool = False) -> jnp.ndarray:
        mats = []
        for i in range(L):
            w = np.asarray(get_tensor(f"model.layers.{i}.{sub}"))
            mats.append(w.T if transpose else w)
        return jnp.asarray(np.stack(mats), dtype=dtype)

    layers = {
        "input_layernorm": stack("input_layernorm.weight"),
        "post_attention_layernorm": stack(
            "post_attention_layernorm.weight"),
        "q_proj": stack("self_attn.q_proj.weight", True),
        "q_bias": stack("self_attn.q_proj.bias"),
        "k_proj": stack("self_attn.k_proj.weight", True),
        "k_bias": stack("self_attn.k_proj.bias"),
        "v_proj": stack("self_attn.v_proj.weight", True),
        "v_bias": stack("self_attn.v_proj.bias"),
        "o_proj": stack("self_attn.o_proj.weight", True),
        "o_bias": stack("self_attn.o_proj.bias"),
        "sinks": stack("self_attn.sinks"),
        "router_w": stack("mlp.router.weight", True),
        "router_b": stack("mlp.router.bias"),
        # experts already [E, D, 2I] / [E, I, D] — no transpose
        "gate_up": stack("mlp.experts.gate_up_proj"),
        "gate_up_b": stack("mlp.experts.gate_up_proj_bias"),
        "down": stack("mlp.experts.down_proj"),
        "down_b": stack("mlp.experts.down_proj_bias"),
    }
    params = {
        "embed_tokens": jnp.asarray(
            np.asarray(get_tensor("model.embed_tokens.weight")),
            dtype=dtype),
        "layers": layers,
        "norm": jnp.asarray(np.asarray(get_tensor("model.norm.weight")),
                            dtype=dtype),
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = jnp.asarray(
            np.asarray(get_tensor("lm_head.weight")).T, dtype=dtype)
    return params


def partition_specs(cfg: GptOssConfig, quantized=None) -> dict:
    from jax.sharding import PartitionSpec as P

    layers = {
        "input_layernorm": P(None, None),
        "post_attention_layernorm": P(None, None),
        "q_proj": P(None, None, "tp"), "q_bias": P(None, "tp"),
        "k_proj": P(None, None, "tp"), "k_bias": P(None, "tp"),
        "v_proj": P(None, None, "tp"), "v_bias": P(None, "tp"),
        "o_proj": P(None, "tp", None), "o_bias": P(None, None),
        "sinks": P(None, "tp"),
        "router_w": P(None, None, None), "router_b": P(None, None),
        "gate_up": P(None, None, None, "tp"),
        "gate_up_b": P(None, None, "tp"),
        "down": P(None, None, "tp", None),
        "down_b": P(None, None, None),
    }
    specs = {"embed_tokens": P(None, None), "layers": layers,
             "norm": P(None)}
    if not cfg.tie_word_embeddings:
        specs["lm_head"] = P(None, "tp")
    return specs


def _moe(h: jnp.ndarray, lp: dict, cfg: GptOssConfig) -> jnp.ndarray:
    """GPT-OSS MoE: biased router, top-k THEN softmax, interleaved
    fused gate_up with the clamped (up+1)*glu activation."""
    T, D = h.shape
    E, K = cfg.num_local_experts, cfg.num_experts_per_tok
    lim = cfg.swiglu_limit

    logits = (h @ lp["router_w"]).astype(jnp.float32) + lp["router_b"]
    topv, topi = jax.lax.top_k(logits, K)                   # [T, K]
    weights = jax.nn.softmax(topv, axis=-1)                 # over the K

    flat_e = topi.reshape(-1)
    order = jnp.argsort(flat_e, stable=True)
    token_of = order // K
    xs = h[token_of]                                        # [T*K, D]
    group_sizes = jnp.bincount(flat_e, length=E).astype(jnp.int32)
    gu = jax.lax.ragged_dot(xs, lp["gate_up"], group_sizes)
    gu = gu + lp["gate_up_b"][flat_e[order]]
    gu = gu.astype(jnp.float32)
    gate, up = gu[:, 0::2], gu[:, 1::2]
    gate = jnp.minimum(gate, lim)
    up = jnp.clip(up, -lim, lim)
    glu = gate * jax.nn.sigmoid(1.702 * gate)
    act = ((up + 1.0) * glu).astype(h.dtype)
    ys = jax.lax.ragged_dot(act, lp["down"], group_sizes)
    ys = ys + lp["down_b"][flat_e[order]]
    w = weights.reshape(-1)[order]
    acc = jax.ops.segment_sum(ys.astype(jnp.float32) * w[:, None],
                              token_of, num_segments=T)
    return acc.astype(h.dtype)


def forward(params, cfg: GptOssConfig, tri_cfg, token_ids, kv_caches,
            md, tri_flags, lora=None, kv_quant=None, moe_fn=None,
            fused_decode=False):
    assert not fused_decode, "GPT-OSS fused-decode path not implemented"
    del tri_flags, lora, kv_quant, moe_fn
    L, p = cfg.num_hidden_layers, cfg.period
    assert L % p == 0
    HQ, KH, Dh = (cfg.num_attention_heads, cfg.num_key_value_heads,
                  cfg.head_dim)
    eps = cfg.rms_norm_eps
    scale = Dh ** -0.5
    group_of = {t: i for i, t in enumerate(cfg.group_order)}

    x = params["embed_tokens"][token_ids]
    cos, sin = rope_cos_sin(
        md.positions, Dh, cfg.rope_theta, dtype=x.dtype,
        scaling=cfg.rope_scaling,
        max_position_embeddings=cfg.max_position_embeddings)

    def md_for(j: int):
        if md.block_tables_g is None:
            return md
        g = group_of[cfg.layer_types[j]]
        return md._replace(block_tables=md.block_tables_g[g],
                           slot_mapping=md.slot_mapping_g[g],
                           kv_slices=None, num_kv_slices=None)

    mds = [md_for(j) for j in range(p)]

    def sub_layer(x, lp, kv, j: int):
        T = x.shape[0]
        window = (cfg.sliding_window
                  if cfg.layer_types[j] == "sliding_attention" else 0)
        h = rms_norm(x, lp["input_layernorm"], eps)
        q = (h @ lp["q_proj"] + lp["q_bias"]).reshape(T, HQ, Dh)
        k = (h @ lp["k_proj"] + lp["k_bias"]).reshape(T, KH, Dh)
        v = (h @ lp["v_proj"] + lp["v_bias"]).reshape(T, KH, Dh)
        q, k = apply_rope(q, k, cos, sin)
        kv = write_kv(kv, k, v, mds[j])
        attn = ragged_paged_attention(
            q, kv, mds[j], False, scale=scale, attn_window=window,
            tri_enabled=False, sinks=lp["sinks"].astype(jnp.float32))
        x = x + (attn.reshape(T, HQ * Dh) @ lp["o_proj"] + lp["o_bias"])
        h2 = rms_norm(x, lp["post_attention_layernorm"], eps)
        return x + _moe(h2, lp, cfg), kv

    chunked = jax.tree_util.tree_map(
        lambda a: a.reshape(L // p, p, *a.shape[1:]), params["layers"])
    kv_chunked = kv_caches.reshape(L // p, p, *kv_caches.shape[1:])

    def chunk_fn(x, scanned):
        lp_c, kv_c = scanned
        new_kv = []
        for j in range(p):
            lp = jax.tree_util.tree_map(lambda a: a[j], lp_c)
            x, kv_j = sub_layer(x, lp, kv_c[j], j)
            new_kv.append(kv_j)
        return x, jnp.stack(new_kv)

    x, new_kv = jax.lax.scan(chunk_fn, x, (chunked, kv_chunked))
    x = rms_norm(x, params["norm"], eps)
    return x, new_kv.reshape(kv_caches.shape)


def compute_logits(params, cfg: GptOssConfig, hidden):
    w = (params["embed_tokens"].T if cfg.tie_word_embeddings
         else params["lm_head"])
    return jnp.dot(hidden, w, preferred_element_type=jnp.float32)
