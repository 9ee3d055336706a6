"""Llama 4 text (Llama4ForCausalLM — Scout/Maverick decoder).

Reference: vllm/model_executor/models/llama4.py + HF
transformers/models/llama4/modeling_llama4.py. Per-layer heterogeneity:

- rope layers (``no_rope_layers[i] == 1``) rotate the FULL head_dim in
  the INTERLEAVED (complex-pair) layout and attend within an aligned
  ``attention_chunk_size`` chunk; with ``use_qk_norm`` q/k get a
  weightless L2 norm AFTER rope (Llama4TextL2Norm);
- NoPE layers (every ``no_rope_layer_interval``-th) skip rotary, attend
  over the FULL context, and with ``attn_temperature_tuning`` scale q by
  ``log1p(floor((pos + 1) / floor_scale)) * attn_scale + 1`` (the long-
  context temperature recipe, modeling_llama4.py:338-344);
- MoE layers (``moe_layers``; every ``interleave_moe_layer_step``-th)
  run sigmoid top-k routing where the router weight multiplies the
  expert INPUT (Llama4Router + Llama4TextMoe: routed_in scaling, not
  output scaling) plus a dense shared expert; other layers run a dense
  SwiGLU of width ``intermediate_size_mlp``.

TPU-native shape: the layer pattern repeats with period
lcm(attention-period, moe-period); layers scan in period-sized chunks
(hybrid_window.py's proven pattern) with one stacked param tree PER
period position, so every per-position attention mode is a STATIC
kernel parameter. KV cache splits into chunked-local + full groups
(ChunkedLocalAttentionSpec reclaims out-of-chunk blocks).
"""

from __future__ import annotations

import math
import re
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
    silu_and_mul,
)
from vllm_trianglemix_tpu.models import decoder as _dec
from vllm_trianglemix_tpu.models.decoder import DecoderConfig

SUPPORTS_FUSED_DECODE = False  # period-chunked scan; single-step decode


@dataclass(frozen=True)
class Llama4Config(DecoderConfig):
    # pattern flags, one per layer (tuples -> hashable/static)
    rope_layers: tuple = ()        # 1 = rope + chunked, 0 = NoPE + full
    moe_layer_flags: tuple = ()    # 1 = MoE layer, 0 = dense
    intermediate_size_mlp: int = 0  # dense-layer ffn width
    use_qk_norm: bool = True
    attn_temperature_tuning: bool = True
    floor_scale: float = 8192.0
    attn_scale: float = 0.1
    attention_chunk_size: int = 8192
    rope_interleaved: bool = True
    rope_theta: float = 500_000.0
    tie_word_embeddings: bool = False
    eos_token_id: int = 200008
    bos_token_id: int = 200000

    @property
    def layer_types(self) -> tuple:
        return tuple("chunked_attention" if r else "full_attention"
                     for r in self.rope_layers)

    @classmethod
    def from_hf_config(cls, cfg: dict[str, Any]) -> "Llama4Config":
        d = dict(cfg)
        if "text_config" in d:
            d = dict(d["text_config"])
        L = d["num_hidden_layers"]
        interval = d.get("no_rope_layer_interval", 4)
        rope = tuple(d.get("no_rope_layers")
                     or [int((i + 1) % interval != 0) for i in range(L)])
        step = d.get("interleave_moe_layer_step", 1)
        moe_idx = set(d.get("moe_layers")
                      if d.get("moe_layers") is not None
                      else range(step - 1, L, step))
        heads = d["num_attention_heads"]
        return cls(
            vocab_size=d["vocab_size"],
            hidden_size=d["hidden_size"],
            intermediate_size=d["intermediate_size"],
            intermediate_size_mlp=d.get("intermediate_size_mlp",
                                        d["intermediate_size"]),
            num_hidden_layers=L,
            num_attention_heads=heads,
            num_key_value_heads=d.get("num_key_value_heads") or heads,
            head_dim=d.get("head_dim") or d["hidden_size"] // heads,
            rms_norm_eps=d.get("rms_norm_eps", 1e-5),
            rope_theta=d.get("rope_theta", 500_000.0),
            rope_scaling=_dec.RopeScalingConfig.from_hf(
                d.get("rope_scaling")),
            num_experts=d.get("num_local_experts", 0),
            num_experts_per_tok=d.get("num_experts_per_tok", 1),
            moe_intermediate_size=d["intermediate_size"],
            rope_layers=rope,
            moe_layer_flags=tuple(int(i in moe_idx) for i in range(L)),
            use_qk_norm=bool(d.get("use_qk_norm", True)),
            attn_temperature_tuning=bool(
                d.get("attn_temperature_tuning", True)),
            floor_scale=float(d.get("floor_scale", 8192)),
            attn_scale=float(d.get("attn_scale", 0.1)),
            attention_chunk_size=d.get("attention_chunk_size") or 8192,
            max_position_embeddings=d.get("max_position_embeddings",
                                          262_144),
            tie_word_embeddings=d.get("tie_word_embeddings", False),
            eos_token_id=(d.get("eos_token_id") or 200008
                          if not isinstance(d.get("eos_token_id"), list)
                          else d["eos_token_id"][0]),
            bos_token_id=d.get("bos_token_id") or 200000,
        )


def _period(cfg: Llama4Config) -> int:
    from vllm_trianglemix_tpu.models.hybrid_window import min_period

    pa = min_period(cfg.rope_layers)
    pm = min_period(cfg.moe_layer_flags)
    p = math.lcm(pa, pm)
    assert cfg.num_hidden_layers % p == 0
    return p


def _pos_cfg(cfg: Llama4Config, j: int) -> DecoderConfig:
    """Uniform-decoder view of period position j (for shape/spec reuse)."""
    p = _period(cfg)
    Lc = cfg.num_hidden_layers // p
    moe = bool(cfg.moe_layer_flags[j])
    return _dec.DecoderConfig(
        vocab_size=cfg.vocab_size, hidden_size=cfg.hidden_size,
        intermediate_size=cfg.intermediate_size_mlp,
        num_hidden_layers=Lc,
        num_attention_heads=cfg.num_attention_heads,
        num_key_value_heads=cfg.num_key_value_heads,
        head_dim=cfg.head_dim, rms_norm_eps=cfg.rms_norm_eps,
        num_experts=cfg.num_experts if moe else 0,
        num_experts_per_tok=cfg.num_experts_per_tok,
        moe_intermediate_size=cfg.moe_intermediate_size,
        shared_expert_intermediate_size=(cfg.moe_intermediate_size
                                         if moe else 0),
        tie_word_embeddings=cfg.tie_word_embeddings)


def shape_tree(cfg: Llama4Config) -> dict:
    p = _period(cfg)
    tree = {"embed_tokens": (cfg.vocab_size, cfg.hidden_size),
            "norm": (cfg.hidden_size,)}
    if not cfg.tie_word_embeddings:
        tree["lm_head"] = (cfg.hidden_size, cfg.vocab_size)
    for j in range(p):
        tree[f"pos{j}"] = _dec.shape_tree(_pos_cfg(cfg, j))["layers"]
    return tree


def partition_specs(cfg: Llama4Config, quantized=None) -> dict:
    from jax.sharding import PartitionSpec as P

    p = _period(cfg)
    specs = {"embed_tokens": P("tp", None), "norm": P(None)}
    if not cfg.tie_word_embeddings:
        specs["lm_head"] = P(None, "tp")
    for j in range(p):
        specs[f"pos{j}"] = _dec.partition_specs(
            _pos_cfg(cfg, j), quantized=quantized)["layers"]
    return specs


def init_random(cfg: Llama4Config, seed: int = 0,
                dtype=jnp.bfloat16) -> dict:
    shapes = shape_tree(cfg)
    leaves, treedef = jax.tree_util.tree_flatten(
        shapes, is_leaf=lambda x: isinstance(x, tuple))
    keys = jax.random.split(jax.random.PRNGKey(seed), len(leaves))
    out = [(jax.random.normal(k, s, jnp.float32) * 0.02).astype(dtype)
           if len(s) > 2 or (len(s) == 2 and s[0] != cfg.num_hidden_layers
                             // _period(cfg))
           else jnp.ones(s, dtype)
           for k, s in zip(keys, leaves)]
    return jax.tree_util.tree_unflatten(treedef, out)


_EXP_RX = re.compile(
    r"model\.layers\.(\d+)\.mlp\.experts\.(\d+)\.(gate|up|down)_proj"
    r"\.weight")


def params_from_hf_state_dict(cfg: Llama4Config, get_tensor,
                              dtype=jnp.bfloat16, quant=None, **kw):
    """HF names: ``model.layers.{i}.feed_forward...`` with dense layers
    carrying gate/up/down_proj and MoE layers carrying ``router.weight``
    + FUSED ``experts.gate_up_proj`` [E, D, 2I] / ``experts.down_proj``
    [E, I, D] raw parameters + ``shared_expert.*`` linears."""
    if quant is not None:
        raise ValueError("quantized Llama-4 checkpoints are not supported")
    p = _period(cfg)
    Lc = cfg.num_hidden_layers // p
    I = cfg.moe_intermediate_size

    def shim_for(j: int):
        def shim(name: str):
            m = _EXP_RX.fullmatch(name)
            if m:
                li = int(m.group(1)) * p + j
                e, which = int(m.group(2)), m.group(3)
                if which == "down":
                    w = np.asarray(get_tensor(
                        f"model.layers.{li}.feed_forward.experts"
                        ".down_proj"))[e]          # [I, D], already in-out
                    return w.T                      # loader re-transposes
                fused = np.asarray(get_tensor(
                    f"model.layers.{li}.feed_forward.experts"
                    ".gate_up_proj"))[e]            # [D, 2I]
                half = fused[:, :I] if which == "gate" else fused[:, I:]
                return half.T                       # loader re-transposes
            m2 = re.fullmatch(r"model\.layers\.(\d+)\.(.+)", name)
            if m2:
                li = int(m2.group(1)) * p + j
                rest = (m2.group(2)
                        .replace("mlp.gate.weight",
                                 "feed_forward.router.weight")
                        .replace("mlp.shared_expert.",
                                 "feed_forward.shared_expert.")
                        .replace("mlp.", "feed_forward."))
                return get_tensor(f"model.layers.{li}.{rest}")
            return get_tensor(name)

        return shim

    params = {}
    for j in range(p):
        pj = _dec.params_from_hf_state_dict(
            _pos_cfg(cfg, j), shim_for(j), dtype=dtype)
        params[f"pos{j}"] = pj["layers"]
        if j == 0:
            params["embed_tokens"] = pj["embed_tokens"]
            params["norm"] = jnp.asarray(
                np.asarray(get_tensor("model.norm.weight")), dtype=dtype)
            if not cfg.tie_word_embeddings:
                params["lm_head"] = pj["lm_head"]
    return params


def _l2norm(x: jnp.ndarray, eps: float) -> jnp.ndarray:
    xf = x.astype(jnp.float32)
    return (xf * jax.lax.rsqrt(
        jnp.mean(jnp.square(xf), -1, keepdims=True) + eps)).astype(x.dtype)


def _llama4_moe(h: jnp.ndarray, lp: dict, cfg: Llama4Config):
    """Sigmoid top-k routing, router weight applied to the expert INPUT
    (Llama4Router/Llama4TextMoe), plus the dense shared expert."""
    T, D = h.shape
    E, K = cfg.num_experts, cfg.num_experts_per_tok
    logits = (h @ lp["moe_gate"]).astype(jnp.float32)      # [T, E]
    topv, topi = jax.lax.top_k(logits, K)
    w = jax.nn.sigmoid(topv)                               # [T, K]
    flat_e = topi.reshape(-1)
    order = jnp.argsort(flat_e, stable=True)
    token_of = order // K
    scale = w.reshape(-1)[order].astype(h.dtype)
    xs = h[token_of] * scale[:, None]                      # input scaling
    group_sizes = jnp.bincount(flat_e, length=E).astype(jnp.int32)
    gated = jax.lax.ragged_dot(xs, lp["gate_proj"], group_sizes)
    up = jax.lax.ragged_dot(xs, lp["up_proj"], group_sizes)
    ys = jax.lax.ragged_dot(silu_and_mul(gated, up), lp["down_proj"],
                            group_sizes)
    acc = jax.ops.segment_sum(ys.astype(jnp.float32), token_of,
                              num_segments=T)
    shared = _dec.apply_linear(
        silu_and_mul(_dec.apply_linear(h, lp["shared_gate_proj"]),
                     _dec.apply_linear(h, lp["shared_up_proj"])),
        lp["shared_down_proj"])
    return acc.astype(h.dtype) + shared


def forward(params, cfg: Llama4Config, tri_cfg, token_ids, kv_caches,
            md, tri_flags, lora=None, kv_quant=None, moe_fn=None,
            fused_decode=False):
    assert not fused_decode, \
        "Llama-4 fused-decode path not implemented (period-chunked scan)"
    del lora, moe_fn
    from vllm_trianglemix_tpu.models.hybrid_window import group_order

    L = cfg.num_hidden_layers
    p = _period(cfg)
    eps = cfg.rms_norm_eps
    HQ, KH, Dh = (cfg.num_attention_heads, cfg.num_key_value_heads,
                  cfg.head_dim)

    x = params["embed_tokens"][token_ids]
    cos, sin = rope_cos_sin(
        md.positions, Dh, cfg.rope_theta, dtype=x.dtype,
        scaling=cfg.rope_scaling,
        max_position_embeddings=cfg.max_position_embeddings)
    attn_kwargs = _dec.build_attn_kwargs(cfg, tri_cfg, kv_quant)
    attn_kwargs.pop("attn_chunk", None)
    if cfg.attn_temperature_tuning:
        pos = md.positions.astype(jnp.float32)
        tune = (jnp.log1p(jnp.floor((pos + 1.0) / cfg.floor_scale))
                * cfg.attn_scale + 1.0)[:, None, None]

    types = cfg.layer_types
    g_of = {t: i for i, t in enumerate(group_order(types))}

    def md_for(j: int):
        if md.block_tables_g is None:
            return md
        g = g_of[types[j]]
        return md._replace(block_tables=md.block_tables_g[g],
                           slot_mapping=md.slot_mapping_g[g],
                           kv_slices=None, num_kv_slices=None)

    mds = [md_for(j) for j in range(p)]

    def sub_layer(x, lp, kv, tri_j, j: int):
        T = x.shape[0]
        rope_on = bool(cfg.rope_layers[j])
        h = rms_norm(x, lp["input_layernorm"], eps)
        q = _dec.apply_linear(h, lp["q_proj"]).reshape(T, HQ, Dh)
        k = _dec.apply_linear(h, lp["k_proj"]).reshape(T, KH, Dh)
        v = _dec.apply_linear(h, lp["v_proj"]).reshape(T, KH, Dh)
        if rope_on:
            q, k = apply_rope(q, k, cos, sin, interleaved=True)
            if cfg.use_qk_norm:
                q, k = _l2norm(q, eps), _l2norm(k, eps)
        elif cfg.attn_temperature_tuning:
            q = (q.astype(jnp.float32) * tune).astype(q.dtype)
        new_kv = write_kv(kv, k, v, mds[j], kv_quant=kv_quant)
        kwargs = dict(attn_kwargs,
                      attn_chunk=cfg.attention_chunk_size
                      if rope_on else 0)
        attn = ragged_paged_attention(q, new_kv, mds[j], tri_j, **kwargs)
        x = x + _dec.apply_linear(attn.reshape(T, HQ * Dh), lp["o_proj"])
        h2 = rms_norm(x, lp["post_attention_layernorm"], eps)
        if cfg.moe_layer_flags[j]:
            mlp = _llama4_moe(h2, lp, cfg)
        else:
            mlp = _dec.apply_linear(
                silu_and_mul(_dec.apply_linear(h2, lp["gate_proj"]),
                             _dec.apply_linear(h2, lp["up_proj"])),
                lp["down_proj"])
        return x + mlp, new_kv

    Lc = L // p
    kv_chunked = kv_caches.reshape(Lc, p, *kv_caches.shape[1:])
    tri_chunked = tri_flags.reshape(Lc, p)
    pos_stacks = tuple(params[f"pos{j}"] for j in range(p))

    def chunk_fn(x, scanned):
        lp_all, kv_c, tri_c = scanned
        new_kv = []
        for j in range(p):
            x, kv_j = sub_layer(x, lp_all[j], kv_c[j], tri_c[j], j)
            new_kv.append(kv_j)
        return x, jnp.stack(new_kv)

    x, new_kv = jax.lax.scan(chunk_fn, x,
                             (pos_stacks, kv_chunked, tri_chunked))
    x = rms_norm(x, params["norm"], eps)
    return x, new_kv.reshape(kv_caches.shape)


def compute_logits(params: dict, cfg: Llama4Config,
                   hidden: jnp.ndarray) -> jnp.ndarray:
    w = (params["embed_tokens"].T if cfg.tie_word_embeddings
         else params["lm_head"])
    return jnp.dot(hidden, w, preferred_element_type=jnp.float32)


def kv_cache_group_specs(cfg: Llama4Config, block_size: int,
                         dtype_bytes: int = 2):
    from vllm_trianglemix_tpu.core.kv_cache_interface import (
        ChunkedLocalAttentionSpec,
        FullAttentionSpec,
        KVCacheGroupSpec,
    )
    from vllm_trianglemix_tpu.models.hybrid_window import group_order

    types = cfg.layer_types
    out = []
    for t in group_order(types):
        layers = tuple(str(i) for i, lt in enumerate(types) if lt == t)
        if t == "chunked_attention":
            spec = ChunkedLocalAttentionSpec(
                block_size=block_size,
                num_kv_heads=cfg.num_key_value_heads,
                head_size=padded_head_dim(cfg.head_dim),
                dtype_bytes=dtype_bytes,
                attention_chunk_size=cfg.attention_chunk_size)
        else:
            spec = FullAttentionSpec(
                block_size=block_size,
                num_kv_heads=cfg.num_key_value_heads,
                head_size=padded_head_dim(cfg.head_dim),
                dtype_bytes=dtype_bytes)
        out.append(KVCacheGroupSpec(layers, spec))
    return out


def kv_cache_spec(cfg: Llama4Config, block_size: int,
                  dtype_bytes: int = 2):
    from vllm_trianglemix_tpu.core.kv_cache_interface import (
        FullAttentionSpec,
    )

    return FullAttentionSpec(block_size=block_size,
                             num_kv_heads=cfg.num_key_value_heads,
                             head_size=padded_head_dim(cfg.head_dim),
                             dtype_bytes=dtype_bytes)
