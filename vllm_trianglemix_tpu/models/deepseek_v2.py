"""DeepSeek-V2 family: Multi-head Latent Attention + shared-expert MoE.

Reference: vllm/model_executor/models/deepseek_v2.py and the HF modeling
(transformers models/deepseek_v2/modeling_deepseek_v2.py). Numerics to
match (HF, fp32):

- MLA projections: q_proj (or q_a→norm→q_b when q_lora_rank is set),
  kv_a_proj_with_mqa → [c_kv | k_pe], kv_a_layernorm on c_kv only,
  kv_b_proj: rank → H·(qk_nope + v_head) (modeling:355-376);
- rope on the rope-parts only, DeepSeek's INTERLEAVED complex-pair
  convention (modeling:272-285 apply_rotary_emb — not rotate-half);
- softmax scale = (qk_nope + qk_rope) ** -0.5 (modeling:336);
- MoE: fp32 gate softmax → greedy or group-limited top-k ×
  routed_scaling_factor, plus always-on shared experts
  (modeling:45-155); the first ``first_k_dense_replace`` layers use a
  dense MLP.

TPU-native shape: the cache stores latent rows (attention/mla.py,
absorbed attention — exact, 10×+ smaller cache); layers run as two
lax.scan stacks (dense prefix, MoE rest) so each stack is a uniform
pytree; routed experts use the same lax.ragged_dot grouped-GEMM path as
models/decoder.py:_moe_mlp. TriangleMix flags are accepted but unused
(MLA rows are dense; triangle sparsity targets standard GQA kernels).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from vllm_trianglemix_tpu.attention.mla import (
    apply_rope_interleaved,
    mla_cache_shape,
    mla_paged_attention,
    mla_write_cache,
    rope_interleaved,
)
from vllm_trianglemix_tpu.layers.common import rms_norm, silu_and_mul

IS_MLA = True


@dataclass(frozen=True)
class DeepseekV2Config:
    vocab_size: int = 102400
    hidden_size: int = 2048
    intermediate_size: int = 10944
    moe_intermediate_size: int = 1408
    num_hidden_layers: int = 27
    num_attention_heads: int = 16
    kv_lora_rank: int = 512
    q_lora_rank: Optional[int] = None
    qk_nope_head_dim: int = 128
    qk_rope_head_dim: int = 64
    v_head_dim: int = 128
    n_routed_experts: int = 64
    n_shared_experts: int = 2
    num_experts_per_tok: int = 6
    first_k_dense_replace: int = 1
    moe_layer_freq: int = 1
    topk_method: str = "greedy"  # greedy | group_limited_greedy | noaux_tc
    scoring_func: str = "softmax"  # softmax (V2) | sigmoid (V3)
    norm_topk_prob: bool = False
    n_group: int = 1
    topk_group: int = 1
    routed_scaling_factor: float = 1.0
    rms_norm_eps: float = 1e-6
    rope_theta: float = 10000.0
    max_position_embeddings: int = 4096
    tie_word_embeddings: bool = False
    # Runner-facing geometry: the "KV head" is the single latent row.
    sliding_window: int = 0
    rope_scaling: Any = None
    eos_token_id: int = 100001
    bos_token_id: int = 100000

    @property
    def num_key_value_heads(self) -> int:
        return 1

    @property
    def head_dim(self) -> int:
        return self.kv_lora_rank + self.qk_rope_head_dim

    @property
    def qk_head_dim(self) -> int:
        return self.qk_nope_head_dim + self.qk_rope_head_dim

    @property
    def num_experts(self) -> int:  # LoRA/EP plumbing compatibility
        return self.n_routed_experts

    @classmethod
    def from_hf_config(cls, cfg: dict) -> "DeepseekV2Config":
        if cfg.get("moe_layer_freq", 1) != 1:
            raise ValueError("moe_layer_freq != 1 not supported")
        if cfg.get("rope_scaling"):
            raise ValueError("DeepSeek yarn rope_scaling not wired yet")
        keys = [
            "vocab_size", "hidden_size", "intermediate_size",
            "moe_intermediate_size", "num_hidden_layers",
            "num_attention_heads", "kv_lora_rank", "q_lora_rank",
            "qk_nope_head_dim", "qk_rope_head_dim", "v_head_dim",
            "n_routed_experts", "n_shared_experts", "num_experts_per_tok",
            "first_k_dense_replace", "topk_method", "scoring_func",
            "norm_topk_prob", "n_group",
            "topk_group", "routed_scaling_factor", "rms_norm_eps",
            "rope_theta", "max_position_embeddings", "tie_word_embeddings",
            "eos_token_id", "bos_token_id",
        ]
        kw = {k: cfg[k] for k in keys if cfg.get(k) is not None}
        if cfg.get("tie_word_embeddings") is not None:
            kw["tie_word_embeddings"] = bool(cfg["tie_word_embeddings"])
        return cls(**kw)

    @classmethod
    def from_pretrained(cls, path: str) -> "DeepseekV2Config":
        with open(os.path.join(path, "config.json")) as f:
            return cls.from_hf_config(json.load(f))


@dataclass(frozen=True)
class DeepseekV3Config(DeepseekV2Config):
    """DeepSeek-V3 (reference vllm models/deepseek_v2.py serves both; HF
    modeling_deepseek_v3.py): same MLA, but sigmoid router scores with an
    aux-loss-free selection bias (e_score_correction_bias, used ONLY to
    pick experts) and group top-k by the sum of each group's top-2."""

    scoring_func: str = "sigmoid"
    topk_method: str = "noaux_tc"
    norm_topk_prob: bool = True


def _attn_shapes(cfg: DeepseekV2Config, L: int) -> dict:
    D = cfg.hidden_size
    H = cfg.num_attention_heads
    shapes = {
        "input_layernorm": (L, D),
        "kv_a_proj": (L, D, cfg.kv_lora_rank + cfg.qk_rope_head_dim),
        "kv_a_layernorm": (L, cfg.kv_lora_rank),
        "kv_b_proj": (L, cfg.kv_lora_rank,
                      H * (cfg.qk_nope_head_dim + cfg.v_head_dim)),
        "o_proj": (L, H * cfg.v_head_dim, D),
        "post_attention_layernorm": (L, D),
    }
    if cfg.q_lora_rank:
        shapes["q_a_proj"] = (L, D, cfg.q_lora_rank)
        shapes["q_a_layernorm"] = (L, cfg.q_lora_rank)
        shapes["q_b_proj"] = (L, cfg.q_lora_rank, H * cfg.qk_head_dim)
    else:
        shapes["q_proj"] = (L, D, H * cfg.qk_head_dim)
    return shapes


def shape_tree(cfg: DeepseekV2Config) -> dict:
    D, I = cfg.hidden_size, cfg.intermediate_size
    Ld = cfg.first_k_dense_replace
    Lm = cfg.num_hidden_layers - Ld
    E, Im = cfg.n_routed_experts, cfg.moe_intermediate_size
    Is = Im * cfg.n_shared_experts
    dense = _attn_shapes(cfg, Ld)
    dense.update({
        "gate_proj": (Ld, D, I),
        "up_proj": (Ld, D, I),
        "down_proj": (Ld, I, D),
    })
    moe = _attn_shapes(cfg, Lm)
    moe.update({
        "moe_gate": (Lm, D, E),
        **({"moe_gate_bias": (Lm, E)}
           if cfg.topk_method == "noaux_tc" else {}),
        "gate_proj": (Lm, E, D, Im),
        "up_proj": (Lm, E, D, Im),
        "down_proj": (Lm, E, Im, D),
        "shared_gate_proj": (Lm, D, Is),
        "shared_up_proj": (Lm, D, Is),
        "shared_down_proj": (Lm, Is, D),
    })
    tree = {
        "embed_tokens": (cfg.vocab_size, D),
        "dense_layers": dense,
        "moe_layers": moe,
        "norm": (D,),
    }
    if not cfg.tie_word_embeddings:
        tree["lm_head"] = (D, cfg.vocab_size)
    return tree


def init_random(cfg: DeepseekV2Config, seed: int = 0,
                dtype=jnp.bfloat16) -> dict:
    shapes = shape_tree(cfg)
    leaves, treedef = jax.tree_util.tree_flatten(
        shapes, is_leaf=lambda x: isinstance(x, tuple))
    keys = jax.random.split(jax.random.PRNGKey(seed), len(leaves))

    def init_one(key, shape):
        if len(shape) == 2 and shape[0] != cfg.vocab_size \
                and shape[1] in (cfg.hidden_size, cfg.kv_lora_rank,
                                 cfg.q_lora_rank or -1):
            return jnp.ones(shape, dtype)  # stacked norm weights
        if len(shape) == 1:
            return jnp.ones(shape, dtype)
        return (jax.random.normal(key, shape, jnp.float32) * 0.02).astype(
            dtype)

    return jax.tree_util.tree_unflatten(
        treedef, [init_one(k, s) for k, s in zip(keys, leaves)])


def params_from_hf_state_dict(cfg: DeepseekV2Config, get_tensor,
                              dtype=jnp.bfloat16, quant=None) -> dict:
    if quant is not None:
        raise ValueError("quantized DeepSeek checkpoints not wired yet")
    Ld = cfg.first_k_dense_replace
    L = cfg.num_hidden_layers

    ATTN = {
        "input_layernorm": ("model.layers.{i}.input_layernorm.weight",
                            False),
        "q_proj": ("model.layers.{i}.self_attn.q_proj.weight", True),
        "q_a_proj": ("model.layers.{i}.self_attn.q_a_proj.weight", True),
        "q_a_layernorm":
            ("model.layers.{i}.self_attn.q_a_layernorm.weight", False),
        "q_b_proj": ("model.layers.{i}.self_attn.q_b_proj.weight", True),
        "kv_a_proj":
            ("model.layers.{i}.self_attn.kv_a_proj_with_mqa.weight", True),
        "kv_a_layernorm":
            ("model.layers.{i}.self_attn.kv_a_layernorm.weight", False),
        "kv_b_proj": ("model.layers.{i}.self_attn.kv_b_proj.weight", True),
        "o_proj": ("model.layers.{i}.self_attn.o_proj.weight", True),
        "post_attention_layernorm":
            ("model.layers.{i}.post_attention_layernorm.weight", False),
    }

    def stack(fmt: str, idxs, transpose: bool) -> jnp.ndarray:
        mats = []
        for i in idxs:
            w = np.asarray(get_tensor(fmt.format(i=i)))
            mats.append(w.T if transpose else w)
        return jnp.asarray(np.stack(mats), dtype=dtype)

    def stack_experts(sub: str, idxs) -> jnp.ndarray:
        mats = []
        for i in idxs:
            per_e = [np.asarray(get_tensor(
                f"model.layers.{i}.mlp.experts.{e}.{sub}.weight")).T
                for e in range(cfg.n_routed_experts)]
            mats.append(np.stack(per_e))
        return jnp.asarray(np.stack(mats), dtype=dtype)

    def attn_params(idxs, tree_keys) -> dict:
        out = {}
        for k in tree_keys:
            if k in ATTN:
                fmt, tr = ATTN[k]
                out[k] = stack(fmt, idxs, tr)
        return out

    tree = shape_tree(cfg)
    d_idx = list(range(Ld))
    m_idx = list(range(Ld, L))

    dense = attn_params(d_idx, tree["dense_layers"])
    for k in ("gate_proj", "up_proj", "down_proj"):
        dense[k] = stack(f"model.layers.{{i}}.mlp.{k}.weight", d_idx, True)

    moe = attn_params(m_idx, tree["moe_layers"])
    moe["moe_gate"] = stack("model.layers.{i}.mlp.gate.weight", m_idx, True)
    if "moe_gate_bias" in tree["moe_layers"]:
        moe["moe_gate_bias"] = stack(
            "model.layers.{i}.mlp.gate.e_score_correction_bias", m_idx,
            False)
    for k in ("gate_proj", "up_proj", "down_proj"):
        moe[k] = stack_experts(k, m_idx)
        moe[f"shared_{k}"] = stack(
            f"model.layers.{{i}}.mlp.shared_experts.{k}.weight", m_idx,
            True)

    params = {
        "embed_tokens": jnp.asarray(
            np.asarray(get_tensor("model.embed_tokens.weight")),
            dtype=dtype),
        "dense_layers": dense,
        "moe_layers": moe,
        "norm": jnp.asarray(np.asarray(get_tensor("model.norm.weight")),
                            dtype=dtype),
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = jnp.asarray(
            np.asarray(get_tensor("lm_head.weight")).T, dtype=dtype)
    return params


def partition_specs(cfg: DeepseekV2Config, quantized=None) -> dict:
    """Megatron-style TP shardings: head-sharded q/kv_b/o, expert- and
    intermediate-sharded MLPs, replicated latent-A projections (small)."""
    from jax.sharding import PartitionSpec as P

    def attn(_):
        s = {
            "input_layernorm": P(None, None),
            "kv_a_proj": P(None, None, None),
            "kv_a_layernorm": P(None, None),
            "kv_b_proj": P(None, None, "tp"),
            "o_proj": P(None, "tp", None),
            "post_attention_layernorm": P(None, None),
        }
        if cfg.q_lora_rank:
            s["q_a_proj"] = P(None, None, None)
            s["q_a_layernorm"] = P(None, None)
            s["q_b_proj"] = P(None, None, "tp")
        else:
            s["q_proj"] = P(None, None, "tp")
        return s

    dense = attn(None)
    dense.update({
        "gate_proj": P(None, None, "tp"),
        "up_proj": P(None, None, "tp"),
        "down_proj": P(None, "tp", None),
    })
    moe = attn(None)
    moe.update({
        "moe_gate": P(None, None, None),
        **({"moe_gate_bias": P(None, None)}
           if cfg.topk_method == "noaux_tc" else {}),
        "gate_proj": P(None, None, None, "tp"),
        "up_proj": P(None, None, None, "tp"),
        "down_proj": P(None, None, "tp", None),
        "shared_gate_proj": P(None, None, "tp"),
        "shared_up_proj": P(None, None, "tp"),
        "shared_down_proj": P(None, "tp", None),
    })
    specs = {
        "embed_tokens": P(None, None),
        "dense_layers": dense,
        "moe_layers": moe,
        "norm": P(None),
    }
    if not cfg.tie_word_embeddings:
        specs["lm_head"] = P(None, "tp")
    return specs


def kv_cache_spec(cfg: DeepseekV2Config, block_size: int,
                  dtype_bytes: int = 2):
    from vllm_trianglemix_tpu.core.kv_cache_interface import (
        MLAAttentionSpec,
    )

    from vllm_trianglemix_tpu.attention.mla import mla_padded_width

    return MLAAttentionSpec(block_size=block_size, num_kv_heads=1,
                            head_size=mla_padded_width(cfg.head_dim),
                            dtype_bytes=dtype_bytes)


def kv_cache_layer_shape(cfg: DeepseekV2Config, num_blocks: int,
                         block_size: int):
    return mla_cache_shape(num_blocks, block_size, cfg.head_dim)


# --- forward ------------------------------------------------------------------

def _mla_attn(x, lp, cfg: DeepseekV2Config, md, cos, sin, kv):
    T = x.shape[0]
    H = cfg.num_attention_heads
    Dn, P, Dv = cfg.qk_nope_head_dim, cfg.qk_rope_head_dim, cfg.v_head_dim
    R = cfg.kv_lora_rank
    eps = cfg.rms_norm_eps
    scale = cfg.qk_head_dim ** -0.5

    h = rms_norm(x, lp["input_layernorm"], eps)
    if cfg.q_lora_rank:
        qa = rms_norm(h @ lp["q_a_proj"], lp["q_a_layernorm"], eps)
        q = qa @ lp["q_b_proj"]
    else:
        q = h @ lp["q_proj"]
    q = q.reshape(T, H, Dn + P)
    q_nope, q_pe = q[..., :Dn], q[..., Dn:]

    ckv = h @ lp["kv_a_proj"]                       # [T, R+P]
    c = rms_norm(ckv[:, :R], lp["kv_a_layernorm"], eps)
    pe = ckv[:, R:]
    q_pe = apply_rope_interleaved(q_pe, cos, sin)
    pe = apply_rope_interleaved(pe, cos, sin)

    rows = jnp.concatenate([c, pe], axis=-1)        # [T, R+P]
    kv = mla_write_cache(kv, rows, md.slot_mapping)

    wkb = lp["kv_b_proj"].reshape(R, H, Dn + Dv)
    q_eff = jnp.einsum("thd,rhd->thr", q_nope.astype(jnp.float32),
                       wkb[..., :Dn].astype(jnp.float32))
    qcat = jnp.concatenate(
        [q_eff, q_pe.astype(jnp.float32)], axis=-1)  # [T, H, R+P]
    attn_lat = mla_paged_attention(qcat, kv, md, scale=scale,
                                   v_dim=R)
    o = jnp.einsum("thr,rhv->thv", attn_lat,
                   wkb[..., Dn:].astype(jnp.float32))
    o = o.astype(x.dtype).reshape(T, H * Dv)
    return x + o @ lp["o_proj"], kv


def _routed_moe(h, lp, cfg: DeepseekV2Config):
    """fp32 gate softmax → (group-limited) greedy top-k × scaling, routed
    grouped GEMM (decoder.py:_moe_mlp pattern), plus shared experts."""
    T, D = h.shape
    E, K = cfg.n_routed_experts, cfg.num_experts_per_tok
    logits = (h.astype(jnp.float32) @ lp["moe_gate"].astype(jnp.float32))
    if cfg.scoring_func == "sigmoid":                         # V3
        scores = jax.nn.sigmoid(logits)
    else:
        scores = jax.nn.softmax(logits, axis=-1)
    # selection scores: V3 adds the aux-loss-free correction bias here
    # ONLY (routing weights still come from the unbiased scores).
    choice = scores
    if "moe_gate_bias" in lp:
        choice = choice + lp["moe_gate_bias"].astype(jnp.float32)
    if cfg.topk_method == "group_limited_greedy" and cfg.n_group > 1:
        G = cfg.n_group
        gs = choice.reshape(T, G, E // G).max(axis=-1)        # [T, G]
        _, gidx = jax.lax.top_k(gs, cfg.topk_group)
        gmask = jnp.zeros((T, G), bool).at[
            jnp.arange(T)[:, None], gidx].set(True)
        choice = jnp.where(
            jnp.repeat(gmask, E // G, axis=1), choice, 0.0)
    elif cfg.topk_method == "noaux_tc" and cfg.n_group > 1:
        G = cfg.n_group
        g2, _ = jax.lax.top_k(choice.reshape(T, G, E // G),
                              min(2, E // G))
        gs = g2.sum(axis=-1)                                  # [T, G]
        _, gidx = jax.lax.top_k(gs, cfg.topk_group)
        gmask = jnp.zeros((T, G), bool).at[
            jnp.arange(T)[:, None], gidx].set(True)
        choice = jnp.where(
            jnp.repeat(gmask, E // G, axis=1), choice, 0.0)
    _, topi = jax.lax.top_k(choice, K)
    topv = jnp.take_along_axis(scores, topi, axis=-1)
    if cfg.scoring_func == "sigmoid" and cfg.norm_topk_prob:
        topv = topv / (topv.sum(-1, keepdims=True) + 1e-20)
    elif cfg.scoring_func == "softmax" and cfg.norm_topk_prob:
        # DeepSeek V1/V2 norm_topk_prob configs renormalize the selected
        # softmax weights (HF modeling denominator; reference
        # deepseek.py:170 fused_topk renormalize).
        topv = topv / (topv.sum(-1, keepdims=True) + 1e-20)
    elif getattr(cfg, "moe_renorm_min", 0.0) > 0.0:
        # Ernie 4.5 MoE: softmax weights are ALWAYS renormalized over the
        # selected experts with a clamped denominator (HF ernie4_5_moe
        # moe_norm_min).
        topv = topv / jnp.maximum(topv.sum(-1, keepdims=True),
                                  cfg.moe_renorm_min)
    topv = topv * cfg.routed_scaling_factor

    flat_e = topi.reshape(-1)
    order = jnp.argsort(flat_e, stable=True)
    token_of = order // K
    xs = h[token_of]
    group_sizes = jnp.bincount(flat_e, length=E).astype(jnp.int32)
    gated = jax.lax.ragged_dot(xs, lp["gate_proj"], group_sizes)
    up = jax.lax.ragged_dot(xs, lp["up_proj"], group_sizes)
    ys = jax.lax.ragged_dot(silu_and_mul(gated, up), lp["down_proj"],
                            group_sizes)
    w = topv.reshape(-1)[order]
    routed = jax.ops.segment_sum(ys.astype(jnp.float32) * w[:, None],
                                 token_of, num_segments=T)

    if "shared_gate_proj" not in lp:     # Glm4Moe/Ernie with 0 shared
        return routed.astype(h.dtype)
    shared = silu_and_mul(h @ lp["shared_gate_proj"],
                          h @ lp["shared_up_proj"]) @ lp["shared_down_proj"]
    return routed.astype(h.dtype) + shared


def forward(params, cfg: DeepseekV2Config, tri_cfg, token_ids, kv_caches,
            md, tri_flags, lora=None, kv_quant=None, moe_fn=None,
            fused_decode=False):
    """Returns (hidden[T, D], new kv_caches [L, nb, page, 1, R+P])."""
    assert not fused_decode, "MLA fused-decode path not implemented"
    del tri_flags, lora, kv_quant, moe_fn  # not supported for MLA yet
    eps = cfg.rms_norm_eps
    Ld = cfg.first_k_dense_replace

    x = params["embed_tokens"][token_ids]
    cos, sin = rope_interleaved(md.positions, cfg.qk_rope_head_dim,
                                cfg.rope_theta, dtype=jnp.float32)

    def dense_layer(x, scanned):
        lp, kv = scanned
        x, kv = _mla_attn(x, lp, cfg, md, cos, sin, kv)
        h2 = rms_norm(x, lp["post_attention_layernorm"], eps)
        mlp = silu_and_mul(h2 @ lp["gate_proj"],
                           h2 @ lp["up_proj"]) @ lp["down_proj"]
        return x + mlp, kv

    def moe_layer(x, scanned):
        lp, kv = scanned
        x, kv = _mla_attn(x, lp, cfg, md, cos, sin, kv)
        h2 = rms_norm(x, lp["post_attention_layernorm"], eps)
        return x + _routed_moe(h2, lp, cfg), kv

    new_kvs = []
    if Ld > 0:
        x, kv_d = jax.lax.scan(dense_layer, x,
                               (params["dense_layers"], kv_caches[:Ld]))
        new_kvs.append(kv_d)
    if Ld < cfg.num_hidden_layers:
        x, kv_m = jax.lax.scan(moe_layer, x,
                               (params["moe_layers"], kv_caches[Ld:]))
        new_kvs.append(kv_m)
    x = rms_norm(x, params["norm"], eps)
    return x, jnp.concatenate(new_kvs, axis=0)


def compute_logits(params, cfg: DeepseekV2Config, hidden):
    if cfg.tie_word_embeddings:
        w = params["embed_tokens"].T
    else:
        w = params["lm_head"]
    return jnp.dot(hidden, w, preferred_element_type=jnp.float32)
