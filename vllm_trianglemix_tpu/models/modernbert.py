"""ModernBERT encoder-only embedder (ModernBertModel — GTE-ModernBERT,
nomic-modernbert and friends).

Reference: vllm/model_executor/models/modernbert.py + HF
transformers/models/modernbert/modeling_modernbert.py. A pre-norm
bidirectional encoder with:

- fused ``attn.Wqkv`` (bias-less by default), rotary positions with a
  PER-LAYER theta: global layers (every ``global_attn_every_n_layers``)
  use ``global_rope_theta``, the rest ``local_rope_theta`` AND restrict
  attention to a +-``local_attention // 2`` bidirectional window
  (ModernBertAttention:464-471, _update_attention_mask);
- layer 0 has NO attention norm (nn.Identity, :520-523);
- GeGLU MLP: ``mlp.Wi`` -> chunk(2) = (input, gate) -> gelu(input) *
  gate -> ``mlp.Wo`` (:235-242);
- embeddings = tok_embeddings + LayerNorm (no position table),
  ``final_norm`` at the end; CLS pooling by default.

The heterogeneous layers (identity norm at 0, per-layer theta/window)
run as a python loop over per-layer parameter dicts — encoder-only
models are one prefill pass, so there is no decode-path cost.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from vllm_trianglemix_tpu.layers.common import rope_cos_sin

IS_ENCODER_ONLY = True
DEFAULT_POOLING_TYPE = "cls"


@dataclass(frozen=True)
class ModernBertConfig:
    vocab_size: int = 50368
    hidden_size: int = 768
    intermediate_size: int = 1152
    num_hidden_layers: int = 22
    num_attention_heads: int = 12
    max_position_embeddings: int = 8192
    norm_eps: float = 1e-5
    norm_bias: bool = False
    attention_bias: bool = False
    mlp_bias: bool = False
    global_rope_theta: float = 160_000.0
    local_rope_theta: float = 10_000.0
    global_attn_every_n_layers: int = 3
    local_attention: int = 128
    eos_token_id: int = 50282
    bos_token_id: int = 50281
    sliding_window: int = 0
    rope_scaling: object = None
    num_experts: int = 0
    tie_word_embeddings: bool = True

    @property
    def num_key_value_heads(self) -> int:
        return self.num_attention_heads

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads

    @classmethod
    def from_hf_config(cls, cfg: dict) -> "ModernBertConfig":
        keys = ["vocab_size", "hidden_size", "intermediate_size",
                "num_hidden_layers", "num_attention_heads",
                "max_position_embeddings", "norm_eps", "norm_bias",
                "attention_bias", "mlp_bias", "global_rope_theta",
                "global_attn_every_n_layers", "local_attention",
                "eos_token_id", "bos_token_id"]
        kw = {k: cfg[k] for k in keys if cfg.get(k) is not None}
        if cfg.get("local_rope_theta") is not None:
            kw["local_rope_theta"] = cfg["local_rope_theta"]
        elif cfg.get("global_rope_theta") is not None:
            kw["local_rope_theta"] = cfg["global_rope_theta"]
        return cls(**kw)

    @classmethod
    def from_pretrained(cls, path: str) -> "ModernBertConfig":
        with open(os.path.join(path, "config.json")) as f:
            return cls.from_hf_config(json.load(f))


def _layer_shapes(cfg: ModernBertConfig, i: int) -> dict:
    D, I = cfg.hidden_size, cfg.intermediate_size
    s = {"wqkv": (D, 3 * D), "wo": (D, D),
         "mlp_norm": (D,), "wi": (D, 2 * I), "wmo": (I, D)}
    if i > 0:
        s["attn_norm"] = (D,)
        if cfg.norm_bias:
            s["attn_norm_b"] = (D,)
    if cfg.norm_bias:
        s["mlp_norm_b"] = (D,)
    if cfg.attention_bias:
        s["wqkv_b"] = (3 * D,)
        s["wo_b"] = (D,)
    if cfg.mlp_bias:
        s["wi_b"] = (2 * I,)
        s["wmo_b"] = (D,)
    return s


def shape_tree(cfg: ModernBertConfig) -> dict:
    D = cfg.hidden_size
    tree = {
        "tok_embeddings": (cfg.vocab_size, D),
        "emb_norm": (D,),
        "layers": [_layer_shapes(cfg, i)
                   for i in range(cfg.num_hidden_layers)],
        "final_norm": (D,),
    }
    if cfg.norm_bias:
        tree["emb_norm_b"] = (D,)
        tree["final_norm_b"] = (D,)
    return tree


def partition_specs(cfg: ModernBertConfig, quantized=None) -> dict:
    return jax.tree_util.tree_map(lambda s: P(*([None] * len(s))),
                                  shape_tree(cfg),
                                  is_leaf=lambda x: isinstance(x, tuple))


def init_random(cfg: ModernBertConfig, seed: int = 0,
                dtype=jnp.bfloat16) -> dict:
    shapes = shape_tree(cfg)
    leaves, treedef = jax.tree_util.tree_flatten(
        shapes, is_leaf=lambda x: isinstance(x, tuple))
    keys = jax.random.split(jax.random.PRNGKey(seed), len(leaves))
    return jax.tree_util.tree_unflatten(
        treedef,
        [(jax.random.normal(k, s, jnp.float32) * 0.02).astype(dtype)
         for k, s in zip(keys, leaves)])


def params_from_hf_state_dict(cfg: ModernBertConfig, get_tensor,
                              dtype=jnp.bfloat16, quant=None) -> dict:
    if quant is not None:
        raise ValueError("quantized ModernBERT checkpoints not wired yet")

    def get(name):
        # bare ModernBertModel dumps vs task models ("model." prefix)
        for prefix in ("", "model."):
            try:
                return np.asarray(get_tensor(prefix + name))
            except KeyError:
                continue
        raise KeyError(name)

    def t(name, transpose=False):
        w = get(name)
        return jnp.asarray(w.T if transpose else w, dtype=dtype)

    layers = []
    for i in range(cfg.num_hidden_layers):
        p = f"layers.{i}"
        lp = {"wqkv": t(f"{p}.attn.Wqkv.weight", True),
              "wo": t(f"{p}.attn.Wo.weight", True),
              "mlp_norm": t(f"{p}.mlp_norm.weight"),
              "wi": t(f"{p}.mlp.Wi.weight", True),
              "wmo": t(f"{p}.mlp.Wo.weight", True)}
        if i > 0:
            lp["attn_norm"] = t(f"{p}.attn_norm.weight")
            if cfg.norm_bias:
                lp["attn_norm_b"] = t(f"{p}.attn_norm.bias")
        if cfg.norm_bias:
            lp["mlp_norm_b"] = t(f"{p}.mlp_norm.bias")
        if cfg.attention_bias:
            lp["wqkv_b"] = t(f"{p}.attn.Wqkv.bias")
            lp["wo_b"] = t(f"{p}.attn.Wo.bias")
        if cfg.mlp_bias:
            lp["wi_b"] = t(f"{p}.mlp.Wi.bias")
            lp["wmo_b"] = t(f"{p}.mlp.Wo.bias")
        layers.append(lp)

    params = {
        "tok_embeddings": t("embeddings.tok_embeddings.weight"),
        "emb_norm": t("embeddings.norm.weight"),
        "layers": layers,
        "final_norm": t("final_norm.weight"),
    }
    if cfg.norm_bias:
        params["emb_norm_b"] = t("embeddings.norm.bias")
        params["final_norm_b"] = t("final_norm.bias")
    return params


def kv_cache_layer_shape(cfg: ModernBertConfig, num_blocks: int,
                         block_size: int):
    # no KV reuse; 1-element dummy rows (bert_embed convention)
    return (num_blocks, 1)


def kv_cache_spec(cfg: ModernBertConfig, block_size: int,
                  dtype_bytes: int = 2):
    from vllm_trianglemix_tpu.models.bert_embed import (
        kv_cache_spec as _spec,
    )

    return _spec(cfg, block_size, dtype_bytes)


def _ln(x, w, b, eps):
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = ((xf - mu) ** 2).mean(-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    y = y * w.astype(jnp.float32)
    if b is not None:
        y = y + b.astype(jnp.float32)
    return y.astype(x.dtype)


def forward(params, cfg: ModernBertConfig, tri_cfg, token_ids, kv_caches,
            md, tri_flags, lora=None, kv_quant=None, moe_fn=None,
            fused_decode=False, mm_scatter=None):
    """One bidirectional pass over the ragged batch. Returns
    (hidden [T, D], kv_caches unchanged)."""
    del tri_cfg, tri_flags, lora, kv_quant, moe_fn, mm_scatter
    T = token_ids.shape[0]
    H, Dh, D = cfg.num_attention_heads, cfg.head_dim, cfg.hidden_size
    eps = cfg.norm_eps
    scale = Dh ** -0.5

    x = _ln(params["tok_embeddings"][token_ids], params["emb_norm"],
            params.get("emb_norm_b"), eps)

    qsl = md.query_start_loc
    live = jnp.arange(T, dtype=jnp.int32) < qsl[md.num_reqs]
    same = (md.req_idx[:, None] == md.req_idx[None, :]) & live[None, :]
    bias_full = jnp.where(same, 0.0, -1e30).astype(jnp.float32)
    dist = jnp.abs(md.positions[:, None] - md.positions[None, :])
    local_ok = same & (dist <= cfg.local_attention // 2)
    bias_local = jnp.where(local_ok, 0.0, -1e30).astype(jnp.float32)

    cos_g, sin_g = rope_cos_sin(md.positions, Dh, cfg.global_rope_theta,
                                dtype=x.dtype)
    cos_l, sin_l = rope_cos_sin(md.positions, Dh, cfg.local_rope_theta,
                                dtype=x.dtype)

    def rot(t, cos, sin):
        # rotate-half over the full head dim; t [T, H, Dh]
        half = Dh // 2
        t1, t2 = t[..., :half], t[..., half:]
        c = cos[:, None, :half]
        s = sin[:, None, :half]
        return jnp.concatenate([t1 * c - t2 * s, t2 * c + t1 * s],
                               axis=-1)

    for i, lp in enumerate(params["layers"]):
        is_global = i % cfg.global_attn_every_n_layers == 0
        h = x if i == 0 else _ln(x, lp["attn_norm"],
                                 lp.get("attn_norm_b"), eps)
        qkv = h @ lp["wqkv"]
        if "wqkv_b" in lp:
            qkv = qkv + lp["wqkv_b"]
        q, k, v = (qkv.reshape(T, 3, H, Dh)[:, j] for j in range(3))
        cos, sin = (cos_g, sin_g) if is_global else (cos_l, sin_l)
        q, k = rot(q, cos, sin), rot(k, cos, sin)
        s = jnp.einsum("qhd,khd->hqk", q, k,
                       preferred_element_type=jnp.float32) * scale
        bias = bias_full if is_global else bias_local
        p_attn = jax.nn.softmax(s + bias[None], axis=-1).astype(v.dtype)
        a = jnp.einsum("hqk,khd->qhd", p_attn, v).reshape(T, D)
        a = a @ lp["wo"]
        if "wo_b" in lp:
            a = a + lp["wo_b"]
        x = x + a
        h2 = _ln(x, lp["mlp_norm"], lp.get("mlp_norm_b"), eps)
        wi = h2 @ lp["wi"]
        if "wi_b" in lp:
            wi = wi + lp["wi_b"]
        inp, gate = wi[:, :cfg.intermediate_size], \
            wi[:, cfg.intermediate_size:]
        m = jax.nn.gelu(inp.astype(jnp.float32),
                        approximate=False).astype(x.dtype) * gate
        m = m @ lp["wmo"]
        if "wmo_b" in lp:
            m = m + lp["wmo_b"]
        x = x + m
    x = _ln(x, params["final_norm"], params.get("final_norm_b"), eps)
    return x, kv_caches


def compute_logits(params, cfg: ModernBertConfig, hidden):
    return jnp.dot(hidden, params["tok_embeddings"].T,
                   preferred_element_type=jnp.float32)
