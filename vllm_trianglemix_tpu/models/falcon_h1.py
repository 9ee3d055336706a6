"""Falcon-H1 (FalconH1ForCausalLM): PARALLEL Mamba-2 + attention hybrid.

Reference: vllm/model_executor/models/falcon_h1.py + HF
transformers/models/falcon_h1/modeling_falcon_h1.py. Unlike Bamba/Jamba
(which alternate layer types), EVERY Falcon-H1 layer runs the SSD mixer
AND GQA attention in parallel on the same normed input and sums them
(modeling_falcon_h1.py:1101-1129), followed by a SwiGLU FFN behind
``pre_ff_layernorm``.

muP multipliers are all linear constants and FOLD INTO THE WEIGHTS at
load: attention_in (q/k/v), key (k), attention_out (o), ssm_in +
section-wise ssm_multipliers mup_vector (in_proj columns,
compute_mup_vector:1172-1206), ssm_out (out_proj), mlp gate/down
multipliers; embedding_multiplier stays a runtime scalar (tied head)
and lm_head_multiplier scales logits.

The gated norm honors ``mamba_rms_norm`` / ``mamba_norm_before_gate`` /
group-wise variance via mamba2_mixer's gate_mode/norm_groups knobs.
Cache: TWO groups over the shared block pool, BOTH spanning every layer
— paged KV via group-0 tables plus per-request Mamba state pages via
group-1 tables, disjoint block ids within each layer's slab.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

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
class FalconH1Config:
    vocab_size: int = 128_000
    hidden_size: int = 4096
    intermediate_size: int = 14336
    num_hidden_layers: int = 32
    num_attention_heads: int = 32
    num_key_value_heads: int = 8
    head_dim: int = 128
    rms_norm_eps: float = 1e-5
    rope_theta: float = 100_000.0
    mamba_d_ssm: int = 1024
    mamba_n_heads: int = 128
    mamba_d_state: int = 128
    mamba_n_groups: int = 1
    mamba_d_conv: int = 4
    mamba_conv_bias: bool = True
    mamba_proj_bias: bool = False
    mamba_rms_norm: bool = False
    mamba_norm_before_gate: bool = True
    embedding_multiplier: float = 1.0
    lm_head_multiplier: float = 1.0
    # muP constants folded into the weights at load time
    attention_in_multiplier: float = 1.0
    key_multiplier: float = 1.0
    attention_out_multiplier: float = 1.0
    ssm_in_multiplier: float = 1.0
    ssm_out_multiplier: float = 1.0
    mlp_multipliers: tuple = (1.0, 1.0)
    ssm_multipliers: tuple = (1.0, 1.0, 1.0, 1.0, 1.0)
    tie_word_embeddings: bool = False
    max_position_embeddings: int = 8192
    eos_token_id: int = 11
    bos_token_id: int = 1
    sliding_window: int = 0
    rope_scaling: object = None
    num_experts: int = 0

    @property
    def d_inner(self) -> int:
        return self.mamba_d_ssm

    @property
    def mamba_d_head(self) -> int:
        return self.mamba_d_ssm // self.mamba_n_heads

    @property
    def conv_dim(self) -> int:
        return (self.d_inner
                + 2 * self.mamba_n_groups * self.mamba_d_state)

    @property
    def state_row_width(self) -> int:
        return (self.conv_dim * (self.mamba_d_conv - 1)
                + self.mamba_n_heads * self.mamba_d_head
                * self.mamba_d_state)

    @classmethod
    def from_hf_config(cls, cfg: dict) -> "FalconH1Config":
        heads = cfg["num_attention_heads"]
        d_ssm = cfg.get("mamba_d_ssm") or int(
            cfg.get("mamba_expand", 2) * cfg["hidden_size"])
        kw = dict(
            vocab_size=cfg["vocab_size"],
            hidden_size=cfg["hidden_size"],
            intermediate_size=cfg["intermediate_size"],
            num_hidden_layers=cfg["num_hidden_layers"],
            num_attention_heads=heads,
            num_key_value_heads=cfg.get("num_key_value_heads") or heads,
            head_dim=cfg.get("head_dim")
            or cfg["hidden_size"] // heads,
            rms_norm_eps=cfg.get("rms_norm_eps", 1e-5),
            rope_theta=cfg.get("rope_theta", 100_000.0),
            mamba_d_ssm=d_ssm,
            mamba_n_heads=cfg.get("mamba_n_heads", 128),
            mamba_d_state=cfg.get("mamba_d_state", 128),
            mamba_n_groups=cfg.get("mamba_n_groups", 1),
            mamba_d_conv=cfg.get("mamba_d_conv", 4),
            mamba_conv_bias=cfg.get("mamba_conv_bias", True),
            mamba_proj_bias=cfg.get("mamba_proj_bias", False),
            mamba_rms_norm=cfg.get("mamba_rms_norm", False),
            mamba_norm_before_gate=cfg.get("mamba_norm_before_gate",
                                           True),
            embedding_multiplier=cfg.get("embedding_multiplier") or 1.0,
            lm_head_multiplier=cfg.get("lm_head_multiplier") or 1.0,
            attention_in_multiplier=(
                cfg.get("attention_in_multiplier") or 1.0),
            key_multiplier=cfg.get("key_multiplier") or 1.0,
            attention_out_multiplier=(
                cfg.get("attention_out_multiplier") or 1.0),
            ssm_in_multiplier=cfg.get("ssm_in_multiplier") or 1.0,
            ssm_out_multiplier=cfg.get("ssm_out_multiplier") or 1.0,
            mlp_multipliers=tuple(cfg.get("mlp_multipliers")
                                  or (1.0, 1.0)),
            ssm_multipliers=tuple(cfg.get("ssm_multipliers")
                                  or (1.0,) * 5),
            tie_word_embeddings=cfg.get("tie_word_embeddings", False),
            max_position_embeddings=cfg.get("max_position_embeddings",
                                            8192),
            eos_token_id=cfg.get("eos_token_id") or 11,
            bos_token_id=cfg.get("bos_token_id") or 1,
        )
        if cfg.get("mamba_d_head") not in (None, "auto") \
                and cfg["mamba_d_head"] * kw["mamba_n_heads"] != d_ssm:
            raise ValueError("mamba_d_head * mamba_n_heads != mamba_d_ssm")
        return cls(**kw)

    @classmethod
    def from_pretrained(cls, path: str) -> "FalconH1Config":
        with open(os.path.join(path, "config.json")) as f:
            return cls.from_hf_config(json.load(f))


def _layer_shapes(cfg: FalconH1Config) -> dict:
    D, I = cfg.hidden_size, cfg.intermediate_size
    HQ, KH, Dh = (cfg.num_attention_heads, cfg.num_key_value_heads,
                  cfg.head_dim)
    din, cd = cfg.d_inner, cfg.conv_dim
    H, K = cfg.mamba_n_heads, cfg.mamba_d_conv
    s: dict = {"input_layernorm": (D,), "pre_ff_layernorm": (D,),
               "gate_proj": (D, I), "up_proj": (D, I),
               "down_proj": (I, D),
               "q_proj": (D, HQ * Dh), "k_proj": (D, KH * Dh),
               "v_proj": (D, KH * Dh), "o_proj": (HQ * Dh, D),
               "in_proj": (D, din + cd + H),
               "conv_w": (cd, K), "dt_bias": (H,), "A_log": (H,),
               "D": (H,), "out_proj": (din, D)}
    if cfg.mamba_rms_norm:
        s["gated_norm"] = (din,)
    if cfg.mamba_conv_bias:
        s["conv_b"] = (cd,)
    if cfg.mamba_proj_bias:
        s["in_bias"] = (din + cd + H,)
        s["out_bias"] = (D,)
    return s


def shape_tree(cfg: FalconH1Config) -> dict:
    tree = {
        "embed_tokens": (cfg.vocab_size, cfg.hidden_size),
        "layers": [_layer_shapes(cfg)
                   for _ in range(cfg.num_hidden_layers)],
        "norm": (cfg.hidden_size,),
    }
    if not cfg.tie_word_embeddings:
        tree["lm_head"] = (cfg.hidden_size, cfg.vocab_size)
    return tree


def partition_specs(cfg: FalconH1Config, quantized=None) -> dict:
    return jax.tree_util.tree_map(lambda s: P(*([None] * len(s))),
                                  shape_tree(cfg),
                                  is_leaf=lambda x: isinstance(x, tuple))


def init_random(cfg: FalconH1Config, seed: int = 0, dtype=jnp.bfloat16):
    shapes = shape_tree(cfg)
    leaves, treedef = jax.tree_util.tree_flatten(
        shapes, is_leaf=lambda x: isinstance(x, tuple))
    keys = jax.random.split(jax.random.PRNGKey(seed), len(leaves))
    vals = [(jax.random.normal(k, s, jnp.float32) * 0.02).astype(dtype)
            for k, s in zip(keys, leaves)]
    return jax.tree_util.tree_unflatten(treedef, vals)


def _mup_vector(cfg: FalconH1Config) -> np.ndarray:
    """compute_mup_vector (modeling_falcon_h1.py:1172-1206) times the
    scalar ssm_in_multiplier: per-section scales over in_proj outputs
    [z | x | B | C | dt]."""
    din = cfg.d_inner
    gts = cfg.mamba_n_groups * cfg.mamba_d_state
    m = np.ones(din + cfg.conv_dim + cfg.mamba_n_heads, np.float64)
    zxbcdt = cfg.ssm_multipliers
    m[:din] *= zxbcdt[0]
    m[din:2 * din] *= zxbcdt[1]
    m[2 * din:2 * din + gts] *= zxbcdt[2]
    m[2 * din + gts:2 * din + 2 * gts] *= zxbcdt[3]
    m[2 * din + 2 * gts:] *= zxbcdt[4]
    return m * cfg.ssm_in_multiplier


def params_from_hf_state_dict(cfg: FalconH1Config, get_tensor,
                              dtype=jnp.bfloat16, quant=None, **kw):
    if quant is not None:
        raise ValueError("quantized Falcon-H1 checkpoints are not "
                         "supported")
    attn_in = cfg.attention_in_multiplier
    key_m = cfg.key_multiplier
    attn_out = cfg.attention_out_multiplier
    ssm_out = cfg.ssm_out_multiplier
    gate_m, down_m = cfg.mlp_multipliers
    mup = _mup_vector(cfg)

    def t(name, transpose=False, scale=None):
        w = np.asarray(get_tensor(name)).astype(np.float64)
        if transpose:
            w = w.T
        if scale is not None:
            w = w * scale
        return jnp.asarray(w, dtype=dtype)

    layers = []
    for i in range(cfg.num_hidden_layers):
        p = f"model.layers.{i}"
        m = f"{p}.mamba"
        lp = {
            "input_layernorm": t(f"{p}.input_layernorm.weight"),
            "pre_ff_layernorm": t(f"{p}.pre_ff_layernorm.weight"),
            "q_proj": t(f"{p}.self_attn.q_proj.weight", True,
                        attn_in),
            "k_proj": t(f"{p}.self_attn.k_proj.weight", True,
                        attn_in * key_m),
            "v_proj": t(f"{p}.self_attn.v_proj.weight", True, attn_in),
            "o_proj": t(f"{p}.self_attn.o_proj.weight", True, attn_out),
            "in_proj": t(f"{m}.in_proj.weight", True, mup[None, :]),
            "conv_w": jnp.asarray(
                np.asarray(get_tensor(f"{m}.conv1d.weight"))[:, 0, :],
                dtype),
            "dt_bias": t(f"{m}.dt_bias"),
            "A_log": t(f"{m}.A_log"),
            "D": t(f"{m}.D"),
            "out_proj": t(f"{m}.out_proj.weight", True, ssm_out),
            "gate_proj": t(f"{p}.feed_forward.gate_proj.weight", True,
                           gate_m),
            "up_proj": t(f"{p}.feed_forward.up_proj.weight", True),
            "down_proj": t(f"{p}.feed_forward.down_proj.weight", True,
                           down_m),
        }
        if cfg.mamba_rms_norm:
            lp["gated_norm"] = t(f"{m}.norm.weight")
        if cfg.mamba_conv_bias:
            lp["conv_b"] = t(f"{m}.conv1d.bias")
        if cfg.mamba_proj_bias:
            lp["in_bias"] = t(f"{m}.in_proj.bias", scale=mup)
            lp["out_bias"] = t(f"{m}.out_proj.bias", scale=ssm_out)
        layers.append(lp)

    params = {
        "embed_tokens": t("model.embed_tokens.weight"),
        "layers": layers,
        "norm": t("model.final_layernorm.weight"),
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = t("lm_head.weight", True)
    return params


def forward(params, cfg: FalconH1Config, tri_cfg, token_ids, kv_caches,
            md, tri_flags, lora=None, kv_quant=None, moe_fn=None,
            fused_decode=False):
    assert not fused_decode, "Falcon-H1 fused-decode path not implemented"
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
    gate_mode = ("norm_then_gate" if cfg.mamba_norm_before_gate
                 else "gate_then_norm") if cfg.mamba_rms_norm \
        else "gate_only"

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
    if cfg.embedding_multiplier != 1.0:
        x = x * jnp.asarray(cfg.embedding_multiplier, x.dtype)
    cos, sin = rope_cos_sin(md.positions, Dh, cfg.rope_theta,
                            dtype=x.dtype,
                            max_position_embeddings=(
                                cfg.max_position_embeddings))
    new_kvs = []
    for i, lp in enumerate(params["layers"]):
        kv_l = kv_caches[i]
        h = rms_norm(x, lp["input_layernorm"], eps)

        # --- SSD mixer branch
        rows = kv_l[stabs].reshape(R, -1)[:, :W].astype(jnp.float32)
        conv_hist = rows[:, :cd * (K - 1)].reshape(R, cd, K - 1)
        ssm0 = rows[:, cd * (K - 1):].reshape(R, H, P_, N)
        m_out, hist_new, ssm_new = mamba2_mixer(
            lp, h, conv_hist, ssm0, rq, off, is_start, li,
            H=H, P_=P_, N=N, G=G, din=din, cd=cd, K=K, eps=eps,
            gate_mode=gate_mode, norm_groups=G)
        rows_new = jnp.concatenate(
            [hist_new.reshape(R, -1), ssm_new.reshape(R, -1)], axis=1)
        rows_new = jnp.pad(rows_new, ((0, 0), (0, S * pe - W)))
        chunks = rows_new.reshape(
            R, S, page, kv_caches.shape[3],
            kv_caches.shape[4]).astype(kv_l.dtype)
        safe = jnp.where(has_tokens[:, None], stabs, num_blocks)
        kv_l = kv_l.at[safe].set(chunks, mode="drop")

        # --- attention branch (same normed input)
        q = (h @ lp["q_proj"]).reshape(T, HQ, Dh)
        k = (h @ lp["k_proj"]).reshape(T, KH, Dh)
        v = (h @ lp["v_proj"]).reshape(T, KH, Dh)
        q, k = apply_rope(q, k, cos, sin)
        kv_l = write_kv(kv_l, k, v, md0)
        a = ragged_paged_attention(q, kv_l, md0, False, scale=scale,
                                   tri_enabled=False)
        a_out = a.reshape(T, HQ * Dh) @ lp["o_proj"]

        x = x + m_out + a_out
        h2 = rms_norm(x, lp["pre_ff_layernorm"], eps)
        x = x + silu_and_mul(h2 @ lp["gate_proj"],
                             h2 @ lp["up_proj"]) @ lp["down_proj"]
        new_kvs.append(kv_l)
    x = rms_norm(x, params["norm"], eps)
    return x, jnp.stack(new_kvs)


def compute_logits(params, cfg: FalconH1Config, hidden):
    w = (params["embed_tokens"].T if cfg.tie_word_embeddings
         else params["lm_head"])
    logits = jnp.dot(hidden, w, preferred_element_type=jnp.float32)
    if cfg.lm_head_multiplier != 1.0:
        logits = logits * cfg.lm_head_multiplier
    return logits


def kv_cache_group_specs(cfg: FalconH1Config, block_size: int,
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
                           num_state_pages=cdiv(cfg.state_row_width,
                                                pe))),
    ]


def kv_cache_spec(cfg: FalconH1Config, block_size: int,
                  dtype_bytes: int = 2):
    return kv_cache_group_specs(cfg, block_size, dtype_bytes)[0] \
        .kv_cache_spec
