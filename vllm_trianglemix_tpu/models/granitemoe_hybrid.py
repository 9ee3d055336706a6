"""Granite 4.0 hybrid (GraniteMoeHybridForCausalLM): Mamba-2 /
attention mix + GraniteMoe fused experts + Granite multipliers.

Reference: vllm/model_executor/models/granitemoehybrid.py + HF
transformers/models/granitemoehybrid/modeling_granitemoehybrid.py —
Bamba's layer mix (mamba2_mixer or GQA attention per ``layer_types``)
where attention layers run WITHOUT rope (position_embedding_type is not
"rope" in Granite 4.0) and every residual add is scaled by
``residual_multiplier``; the FF block is GraniteMoe's fused-expert MoE
(top-k then softmax over the selected logits == the decoder's
softmax→top-k→renorm) PLUS the fused shared MLP on the same normed
input. Cache layout and state paging are Bamba's (models/bamba.py).
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
    ragged_paged_attention,
    write_kv,
)
from vllm_trianglemix_tpu.layers.common import rms_norm
from vllm_trianglemix_tpu.models import decoder as _dec
from vllm_trianglemix_tpu.models.bamba import cdiv
from vllm_trianglemix_tpu.models.granitemoe import _shim as _granite_shim
from vllm_trianglemix_tpu.models.mamba2 import mamba2_mixer

SUPPORTS_FUSED_DECODE = False  # python-loop hybrid forward

# Cache declaration: Bamba's two-group scheme works unchanged.
from vllm_trianglemix_tpu.models.bamba import (  # noqa: E402
    kv_cache_group_specs as _bamba_groups,
    kv_cache_spec as _bamba_spec,
)


@dataclass(frozen=True)
class GraniteMoeHybridConfig:
    vocab_size: int = 49_160
    hidden_size: int = 1536
    intermediate_size: int = 512
    num_hidden_layers: int = 40
    num_attention_heads: int = 12
    num_key_value_heads: int = 4
    layer_types_override: tuple = field(default=())
    rms_norm_eps: float = 1e-5
    num_experts: int = 62
    num_experts_per_tok: int = 6
    shared_intermediate_size: int = 1024
    embedding_multiplier: float = 1.0
    residual_multiplier: float = 1.0
    attention_multiplier: float | None = None
    logits_scaling: float = 1.0
    use_rope: bool = False
    mamba_n_heads: int = 48
    mamba_d_head: int = 64
    mamba_d_state: int = 128
    mamba_n_groups: int = 1
    mamba_expand: int = 2
    mamba_d_conv: int = 4
    mamba_conv_bias: bool = True
    tie_word_embeddings: bool = True
    max_position_embeddings: int = 131_072
    eos_token_id: int = 0
    bos_token_id: int = 0
    sliding_window: int = 0
    rope_scaling: object = None

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
        return self.layer_types_override

    @property
    def moe_intermediate_size(self) -> int:
        return self.intermediate_size

    @property
    def shared_expert_intermediate_size(self) -> int:
        return self.shared_intermediate_size

    @property
    def state_row_width(self) -> int:
        return (self.conv_dim * (self.mamba_d_conv - 1)
                + self.mamba_n_heads * self.mamba_d_head
                * self.mamba_d_state)

    @classmethod
    def from_hf_config(cls, cfg: dict) -> "GraniteMoeHybridConfig":
        kw = {}
        for k in ("vocab_size", "hidden_size", "intermediate_size",
                  "num_hidden_layers", "num_attention_heads",
                  "num_key_value_heads", "rms_norm_eps",
                  "shared_intermediate_size", "embedding_multiplier",
                  "residual_multiplier", "attention_multiplier",
                  "logits_scaling", "mamba_n_heads", "mamba_d_head",
                  "mamba_d_state", "mamba_n_groups", "mamba_expand",
                  "mamba_d_conv", "mamba_conv_bias",
                  "tie_word_embeddings", "max_position_embeddings",
                  "eos_token_id", "bos_token_id"):
            if cfg.get(k) is not None:
                kw[k] = cfg[k]
        kw["num_experts"] = cfg.get("num_local_experts", 0)
        kw["num_experts_per_tok"] = cfg.get("num_experts_per_tok", 6)
        kw["layer_types_override"] = tuple(cfg.get("layer_types") or ())
        kw["use_rope"] = cfg.get("position_embedding_type") == "rope"
        return cls(**kw)

    @classmethod
    def from_pretrained(cls, path: str) -> "GraniteMoeHybridConfig":
        with open(os.path.join(path, "config.json")) as f:
            return cls.from_hf_config(json.load(f))


def _moe_cfg(cfg: GraniteMoeHybridConfig):
    """DecoderConfig view for decoder._moe_mlp: GraniteMoe routing is
    softmax over the top-k logits == softmax_topk + renorm."""
    return _dec.DecoderConfig(
        vocab_size=cfg.vocab_size, hidden_size=cfg.hidden_size,
        intermediate_size=cfg.intermediate_size,
        num_hidden_layers=1,
        num_attention_heads=cfg.num_attention_heads,
        num_key_value_heads=cfg.num_key_value_heads,
        head_dim=cfg.head_dim,
        num_experts=cfg.num_experts,
        num_experts_per_tok=cfg.num_experts_per_tok,
        moe_intermediate_size=cfg.intermediate_size,
        norm_topk_prob=True, hidden_act="silu",
        shared_expert_intermediate_size=cfg.shared_intermediate_size)


def _layer_shapes(cfg: GraniteMoeHybridConfig, i: int) -> dict:
    D, I = cfg.hidden_size, cfg.intermediate_size
    HQ, KH, Dh = (cfg.num_attention_heads, cfg.num_key_value_heads,
                  cfg.head_dim)
    din, cd = cfg.d_inner, cfg.conv_dim
    H, K = cfg.mamba_n_heads, cfg.mamba_d_conv
    E, Is = cfg.num_experts, cfg.shared_intermediate_size
    s: dict = {"input_layernorm": (D,),
               "post_attention_layernorm": (D,),
               "moe_gate": (D, E), "gate_proj": (E, D, I),
               "up_proj": (E, D, I), "down_proj": (E, I, D),
               "shared_gate_proj": (D, Is), "shared_up_proj": (D, Is),
               "shared_down_proj": (Is, D)}
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


def shape_tree(cfg: GraniteMoeHybridConfig) -> dict:
    tree = {
        "embed_tokens": (cfg.vocab_size, cfg.hidden_size),
        "layers": [_layer_shapes(cfg, i)
                   for i in range(cfg.num_hidden_layers)],
        "norm": (cfg.hidden_size,),
    }
    if not cfg.tie_word_embeddings:
        tree["lm_head"] = (cfg.hidden_size, cfg.vocab_size)
    return tree


def partition_specs(cfg: GraniteMoeHybridConfig, quantized=None) -> dict:
    return jax.tree_util.tree_map(lambda s: P(*([None] * len(s))),
                                  shape_tree(cfg),
                                  is_leaf=lambda x: isinstance(x, tuple))


def init_random(cfg: GraniteMoeHybridConfig, seed: int = 0,
                dtype=jnp.bfloat16):
    shapes = shape_tree(cfg)
    leaves, treedef = jax.tree_util.tree_flatten(
        shapes, is_leaf=lambda x: isinstance(x, tuple))
    keys = jax.random.split(jax.random.PRNGKey(seed), len(leaves))
    vals = [(jax.random.normal(k, s, jnp.float32) * 0.02).astype(dtype)
            for k, s in zip(keys, leaves)]
    return jax.tree_util.tree_unflatten(treedef, vals)


def params_from_hf_state_dict(cfg: GraniteMoeHybridConfig, get_tensor,
                              dtype=jnp.bfloat16, quant=None, **kw):
    if quant is not None:
        raise ValueError("quantized GraniteMoeHybrid checkpoints are "
                         "not supported")
    # GraniteMoe's fused-expert shim translates canonical per-expert /
    # shared names into the fused input/output_linear slices.
    shim = _granite_shim(cfg, get_tensor)

    def t(name, transpose=False):
        w = np.asarray(shim(name))
        return jnp.asarray(w.T if transpose else w, dtype=dtype)

    layers = []
    for i in range(cfg.num_hidden_layers):
        p = f"model.layers.{i}"
        lp = {
            "input_layernorm": t(f"{p}.input_layernorm.weight"),
            "post_attention_layernorm":
                t(f"{p}.post_attention_layernorm.weight"),
            "moe_gate":
                t(f"{p}.block_sparse_moe.router.layer.weight", True),
            "shared_gate_proj":
                t(f"{p}.mlp.shared_expert.gate_proj.weight", True),
            "shared_up_proj":
                t(f"{p}.mlp.shared_expert.up_proj.weight", True),
            "shared_down_proj":
                t(f"{p}.mlp.shared_expert.down_proj.weight", True),
        }
        for k in ("gate_proj", "up_proj", "down_proj"):
            lp[k] = jnp.stack([
                t(f"model.layers.{i}.mlp.experts.{e}.{k}.weight", True)
                for e in range(cfg.num_experts)])
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
        layers.append(lp)

    params = {
        "embed_tokens": t("model.embed_tokens.weight"),
        "layers": layers,
        "norm": t("model.norm.weight"),
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = t("lm_head.weight", True)
    return params


def forward(params, cfg: GraniteMoeHybridConfig, tri_cfg, token_ids,
            kv_caches, md, tri_flags, lora=None, kv_quant=None,
            moe_fn=None, fused_decode=False):
    assert not fused_decode, \
        "GraniteMoeHybrid fused-decode path not implemented"
    del tri_cfg, tri_flags, lora, kv_quant, moe_fn
    T = token_ids.shape[0]
    HQ, KH, Dh = (cfg.num_attention_heads, cfg.num_key_value_heads,
                  cfg.head_dim)
    H, P_, N = cfg.mamba_n_heads, cfg.mamba_d_head, cfg.mamba_d_state
    G = cfg.mamba_n_groups
    din, cd, K = cfg.d_inner, cfg.conv_dim, cfg.mamba_d_conv
    eps = cfg.rms_norm_eps
    scale = (cfg.attention_multiplier
             if cfg.attention_multiplier is not None else Dh ** -0.5)
    rmul = cfg.residual_multiplier
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
    is_start = off == 0
    span = qsl[1:] - qsl[:-1]
    li = jnp.clip(qsl[:-1] + jnp.maximum(span, 1) - 1, 0, T - 1)
    has_tokens = span > 0

    x = params["embed_tokens"][token_ids]
    if cfg.embedding_multiplier != 1.0:
        x = x * jnp.asarray(cfg.embedding_multiplier, x.dtype)
    moe_cfg = _moe_cfg(cfg)
    new_kvs = []
    for i, lp in enumerate(params["layers"]):
        kv_l = kv_caches[i]
        h = rms_norm(x, lp["input_layernorm"], eps)
        if cfg.layer_types[i] == "attention":
            q = (h @ lp["q_proj"]).reshape(T, HQ, Dh)
            k = (h @ lp["k_proj"]).reshape(T, KH, Dh)
            v = (h @ lp["v_proj"]).reshape(T, KH, Dh)
            # Granite 4.0: NoPE attention (position_embedding_type is
            # not "rope"); positions come from causal order alone.
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
        x = x + rmul * out
        h2 = rms_norm(x, lp["post_attention_layernorm"], eps)
        x = x + rmul * _dec._moe_mlp(h2, lp, moe_cfg)
        new_kvs.append(kv_l)
    x = rms_norm(x, params["norm"], eps)
    return x, jnp.stack(new_kvs)


def compute_logits(params, cfg: GraniteMoeHybridConfig, hidden):
    w = (params["embed_tokens"].T if cfg.tie_word_embeddings
         else params["lm_head"])
    logits = jnp.dot(hidden, w, preferred_element_type=jnp.float32)
    if cfg.logits_scaling != 1.0:
        logits = logits / cfg.logits_scaling
    return logits


def kv_cache_group_specs(cfg, block_size: int, dtype_bytes: int = 2):
    return _bamba_groups(cfg, block_size, dtype_bytes)


def kv_cache_spec(cfg, block_size: int, dtype_bytes: int = 2):
    return _bamba_spec(cfg, block_size, dtype_bytes)
