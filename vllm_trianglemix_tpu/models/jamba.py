"""Jamba: hybrid attention + Mamba + MoE (AI21).

Reference: vllm/model_executor/models/jamba.py + HF
transformers/models/jamba/modeling_jamba.py. Layer i is attention iff
``i % attn_layer_period == attn_layer_offset`` (else a Mamba-1 mixer
with Jamba's extra dt/B/C RMSNorms), and its feed-forward is a
16-expert top-2 MoE iff ``i % expert_layer_period ==
expert_layer_offset`` (else a dense SwiGLU MLP). Attention carries NO
positional encoding (the SSM layers encode position); lm_head untied.

TPU-native design:
- TWO KV-cache groups over ONE shared block pool: group 0 holds the
  attention layers' paged GQA KV (FullAttentionSpec); group 1 packs each
  Mamba layer's [conv history | SSM state] row into
  ``ceil(state_width / page_elems)`` standard KV-shaped pages
  (MambaPagesSpec/Manager, core/kv_cache_interface.py) — so the hybrid
  shares the engine's uniform-block-size pool instead of needing the
  pure-Mamba one-row-per-request layout;
- the Mamba math is the exact mixer shared with models/mamba.py
  (mamba_mixer: ragged-segment associative scan, cached causal conv),
  with the Jamba dt/B/C norms enabled via optional param keys;
- layers run as an unrolled loop (heterogeneous params per layer kind);
  the routed MoE reuses the decoder's lax.ragged_dot grouped GEMM.
"""

from __future__ import annotations

import json
import math
import os
from dataclasses import dataclass
from typing import Any

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
from vllm_trianglemix_tpu.models import decoder as dec
from vllm_trianglemix_tpu.models.mamba import mamba_mixer


def cdiv(a: int, b: int) -> int:
    return -(-a // b)


@dataclass(frozen=True)
class JambaConfig:
    vocab_size: int = 65536
    hidden_size: int = 4096
    intermediate_size: int = 14336
    num_hidden_layers: int = 32
    num_attention_heads: int = 32
    num_key_value_heads: int = 8
    attn_layer_period: int = 8
    attn_layer_offset: int = 4
    expert_layer_period: int = 2
    expert_layer_offset: int = 1
    num_experts: int = 16
    num_experts_per_tok: int = 2
    mamba_d_state: int = 16
    mamba_d_conv: int = 4
    mamba_expand: int = 2
    mamba_dt_rank: int = 256
    mamba_conv_bias: bool = True
    mamba_proj_bias: bool = False
    rms_norm_eps: float = 1e-6
    tie_word_embeddings: bool = False
    max_position_embeddings: int = 262144
    eos_token_id: int = 2
    bos_token_id: int = 1
    # engine-facing aliases
    sliding_window: int = 0
    rope_scaling: Any = None

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads

    @property
    def d_inner(self) -> int:
        return self.mamba_expand * self.hidden_size

    @property
    def state_row_width(self) -> int:
        din = self.d_inner
        return din * (self.mamba_d_conv - 1) + din * self.mamba_d_state

    @property
    def layer_types(self) -> tuple:
        return tuple(
            "attention" if i % self.attn_layer_period
            == self.attn_layer_offset else "mamba"
            for i in range(self.num_hidden_layers))

    @property
    def layer_is_moe(self) -> tuple:
        return tuple(
            self.num_experts > 1 and i % self.expert_layer_period
            == self.expert_layer_offset
            for i in range(self.num_hidden_layers))

    @classmethod
    def from_hf_config(cls, cfg: dict[str, Any]) -> "JambaConfig":
        dt_rank = cfg.get("mamba_dt_rank", "auto")
        if dt_rank == "auto":
            dt_rank = math.ceil(cfg["hidden_size"] / 16)
        return cls(
            vocab_size=cfg["vocab_size"],
            hidden_size=cfg["hidden_size"],
            intermediate_size=cfg["intermediate_size"],
            num_hidden_layers=cfg["num_hidden_layers"],
            num_attention_heads=cfg["num_attention_heads"],
            num_key_value_heads=cfg.get("num_key_value_heads",
                                        cfg["num_attention_heads"]),
            attn_layer_period=cfg.get("attn_layer_period", 8),
            attn_layer_offset=cfg.get("attn_layer_offset", 4),
            expert_layer_period=cfg.get("expert_layer_period", 2),
            expert_layer_offset=cfg.get("expert_layer_offset", 1),
            num_experts=cfg.get("num_experts", 16),
            num_experts_per_tok=cfg.get("num_experts_per_tok", 2),
            mamba_d_state=cfg.get("mamba_d_state", 16),
            mamba_d_conv=cfg.get("mamba_d_conv", 4),
            mamba_expand=cfg.get("mamba_expand", 2),
            mamba_dt_rank=dt_rank,
            mamba_conv_bias=cfg.get("mamba_conv_bias", True),
            mamba_proj_bias=cfg.get("mamba_proj_bias", False),
            rms_norm_eps=cfg.get("rms_norm_eps", 1e-6),
            tie_word_embeddings=cfg.get("tie_word_embeddings", False),
            max_position_embeddings=cfg.get("max_position_embeddings",
                                            262144),
            eos_token_id=cfg.get("eos_token_id", 2),
            bos_token_id=cfg.get("bos_token_id", 1),
        )

    @classmethod
    def from_pretrained(cls, path: str) -> "JambaConfig":
        with open(os.path.join(path, "config.json")) as f:
            return cls.from_hf_config(json.load(f))


# --- parameter tree -----------------------------------------------------------

def _layer_shapes(cfg: JambaConfig, i: int) -> dict:
    D, I = cfg.hidden_size, cfg.intermediate_size
    HQ, KH, Dh = (cfg.num_attention_heads, cfg.num_key_value_heads,
                  cfg.head_dim)
    din, N, K, tsr = (cfg.d_inner, cfg.mamba_d_state, cfg.mamba_d_conv,
                      cfg.mamba_dt_rank)
    s: dict = {"input_layernorm": (D,), "pre_ff_layernorm": (D,)}
    if cfg.layer_types[i] == "attention":
        s.update(q_proj=(D, HQ * Dh), k_proj=(D, KH * Dh),
                 v_proj=(D, KH * Dh), o_proj=(HQ * Dh, D))
    else:
        s.update(in_proj=(D, 2 * din), conv_w=(din, K),
                 x_proj=(din, tsr + 2 * N), dt_proj=(tsr, din),
                 dt_bias=(din,), A_log=(din, N), D=(din,),
                 out_proj=(din, D), dt_norm=(tsr,), b_norm=(N,),
                 c_norm=(N,))
        if cfg.mamba_conv_bias:
            s["conv_b"] = (din,)
        if cfg.mamba_proj_bias:
            s["in_bias"] = (2 * din,)
            s["out_bias"] = (D,)
    if cfg.layer_is_moe[i]:
        E = cfg.num_experts
        s.update(moe_gate=(D, E), gate_proj=(E, D, I),
                 up_proj=(E, D, I), down_proj=(E, I, D))
    else:
        s.update(gate_proj=(D, I), up_proj=(D, I), down_proj=(I, D))
    return s


def shape_tree(cfg: JambaConfig) -> dict:
    tree = {
        "embed_tokens": (cfg.vocab_size, cfg.hidden_size),
        "layers": [_layer_shapes(cfg, i)
                   for i in range(cfg.num_hidden_layers)],
        "norm": (cfg.hidden_size,),
    }
    if not cfg.tie_word_embeddings:
        tree["lm_head"] = (cfg.hidden_size, cfg.vocab_size)
    return tree


def partition_specs(cfg: JambaConfig, quantized=None) -> dict:
    # Replicated for now; Megatron-style sharding of the attention/MoE
    # mats is a one-line spec change per key when a sharded Jamba lands.
    return jax.tree_util.tree_map(lambda s: P(*([None] * len(s))),
                                  shape_tree(cfg),
                                  is_leaf=lambda x: isinstance(x, tuple))


def init_random(cfg: JambaConfig, seed: int = 0, dtype=jnp.bfloat16):
    shapes = shape_tree(cfg)
    leaves, treedef = jax.tree_util.tree_flatten(
        shapes, is_leaf=lambda x: isinstance(x, tuple))
    keys = jax.random.split(jax.random.PRNGKey(seed), len(leaves))
    vals = [(jax.random.normal(k, s, jnp.float32) * 0.02).astype(dtype)
            for k, s in zip(keys, leaves)]
    return jax.tree_util.tree_unflatten(treedef, vals)


def params_from_hf_state_dict(cfg: JambaConfig, get_tensor,
                              dtype=jnp.bfloat16, quant=None, **kw):
    if quant is not None:
        raise ValueError("quantized Jamba checkpoints are not supported")

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
                x_proj=t(f"{m}.x_proj.weight", True),
                dt_proj=t(f"{m}.dt_proj.weight", True),
                dt_bias=t(f"{m}.dt_proj.bias"),
                A_log=t(f"{m}.A_log"),
                D=t(f"{m}.D"),
                out_proj=t(f"{m}.out_proj.weight", True),
                dt_norm=t(f"{m}.dt_layernorm.weight"),
                b_norm=t(f"{m}.b_layernorm.weight"),
                c_norm=t(f"{m}.c_layernorm.weight"),
            )
            if cfg.mamba_conv_bias:
                lp["conv_b"] = t(f"{m}.conv1d.bias")
            if cfg.mamba_proj_bias:
                lp["in_bias"] = t(f"{m}.in_proj.bias")
                lp["out_bias"] = t(f"{m}.out_proj.bias")
        ff = f"{p}.feed_forward"
        if cfg.layer_is_moe[i]:
            lp["moe_gate"] = t(f"{ff}.router.weight", True)
            for k in ("gate_proj", "up_proj", "down_proj"):
                lp[k] = jnp.stack([
                    t(f"{ff}.experts.{e}.{k}.weight", True)
                    for e in range(cfg.num_experts)])
        else:
            for k in ("gate_proj", "up_proj", "down_proj"):
                lp[k] = t(f"{ff}.{k}.weight", True)
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

def _moe_cfg(cfg: JambaConfig) -> dec.DecoderConfig:
    # shim for the decoder's grouped-GEMM MoE: Jamba routes with a
    # softmax-then-topk WITHOUT renormalization (modeling_jamba
    # JambaSparseMoeBlock.forward)
    return dec.DecoderConfig(
        num_experts=cfg.num_experts,
        num_experts_per_tok=cfg.num_experts_per_tok,
        norm_topk_prob=False, hidden_act="silu",
        shared_expert_intermediate_size=0)


def forward(params, cfg: JambaConfig, tri_cfg, token_ids, kv_caches,
            md, tri_flags, lora=None, kv_quant=None, moe_fn=None,
            fused_decode=False):
    assert not fused_decode, "Jamba fused-decode path not implemented"
    del tri_cfg, tri_flags, lora, kv_quant, moe_fn
    T = token_ids.shape[0]
    HQ, KH, Dh = (cfg.num_attention_heads, cfg.num_key_value_heads,
                  cfg.head_dim)
    din, N, K, tsr = (cfg.d_inner, cfg.mamba_d_state, cfg.mamba_d_conv,
                      cfg.mamba_dt_rank)
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
    stabs = bt1[:, :S]                                # [R, S] state pages
    R = stabs.shape[0]

    rq = md.req_idx
    qsl = md.query_start_loc
    off = jnp.arange(T, dtype=jnp.int32) - qsl[rq]
    is_start = off == 0
    span = qsl[1:] - qsl[:-1]
    li = jnp.clip(qsl[:-1] + jnp.maximum(span, 1) - 1, 0, T - 1)
    has_tokens = span > 0

    x = params["embed_tokens"][token_ids]
    moe_cfg = _moe_cfg(cfg)
    new_kvs = []
    for i, lp in enumerate(params["layers"]):
        kv_l = kv_caches[i]
        h = rms_norm(x, lp["input_layernorm"], eps)
        if cfg.layer_types[i] == "attention":
            q = (h @ lp["q_proj"]).reshape(T, HQ, Dh)
            k = (h @ lp["k_proj"]).reshape(T, KH, Dh)
            v = (h @ lp["v_proj"]).reshape(T, KH, Dh)
            kv_l = write_kv(kv_l, k, v, md0)
            a = ragged_paged_attention(q, kv_l, md0, False, scale=scale,
                                       tri_enabled=False)
            out = a.reshape(T, HQ * Dh) @ lp["o_proj"]
        else:
            rows = kv_l[stabs].reshape(R, -1)[:, :W].astype(jnp.float32)
            conv_hist = rows[:, :din * (K - 1)].reshape(R, din, K - 1)
            ssm0 = rows[:, din * (K - 1):].reshape(R, din, N)
            out, hist_new, ssm_new = mamba_mixer(
                lp, h, conv_hist, ssm0, rq, off, is_start, li,
                din=din, N=N, K=K, tsr=tsr, eps=eps)
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
        if "moe_gate" in lp:
            ff = dec._moe_mlp(h2, lp, moe_cfg)
        else:
            ff = silu_and_mul(h2 @ lp["gate_proj"],
                              h2 @ lp["up_proj"]) @ lp["down_proj"]
        x = x + ff
        new_kvs.append(kv_l)
    x = rms_norm(x, params["norm"], eps)
    return x, jnp.stack(new_kvs)


def compute_logits(params, cfg: JambaConfig, hidden):
    w = (params["embed_tokens"].T if cfg.tie_word_embeddings
         else params["lm_head"])
    return jnp.dot(hidden, w, preferred_element_type=jnp.float32)


# --- KV cache declaration -----------------------------------------------------

def kv_cache_group_specs(cfg: JambaConfig, block_size: int,
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


def kv_cache_spec(cfg: JambaConfig, block_size: int, dtype_bytes: int = 2):
    return kv_cache_group_specs(cfg, block_size, dtype_bytes)[0] \
        .kv_cache_spec
