"""Gemma-2: alternating sliding/full attention + sandwich norms.

Reference: vllm/model_executor/models/gemma2.py and HF
transformers/models/gemma2/modeling_gemma2.py. Numerics to match:

- Gemma RMSNorm: fp32 ``x * rsqrt(mean(x^2)+eps) * (1 + w)`` (zeros-init
  weight, modeling_gemma2.py:50-62);
- embeddings scaled by ``sqrt(hidden_size)`` cast to the model dtype;
- sandwich norms: post_attention_layernorm applies to the attention
  OUTPUT before the residual add, and the MLP is wrapped in
  pre/post_feedforward_layernorms;
- attention scale ``query_pre_attn_scalar ** -0.5`` (modeling:212) and
  logit soft-capping both in attention (50.0) and on the final logits
  (30.0);
- GeGLU (gelu_pytorch_tanh) MLP;
- ``layer_types`` alternates sliding_attention / full_attention — HF
  enforces the window per layer (modeling:229).

TPU-native shape: layers scan in PERIOD-sized chunks (period = the
minimal repeat of layer_types, 2 for Gemma-2) so every per-layer window
stays a STATIC kernel parameter — no dynamic window predicates inside
the attention kernels. The engine carves the KV cache into one group
per attention type (kv_cache_group_specs) with per-group block tables;
the sliding group's SingleTypeKVCacheManager reclaims out-of-window
blocks into the shared pool (core/kv_cache_manager.py coordinator).
forward() also accepts single-group metadata (md.block_tables_g=None)
— windows are then enforced by masking alone.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field
from typing import Any, Optional

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
    rope_cos_sin,
)


def gelu_tanh_and_mul(gate: jnp.ndarray, up: jnp.ndarray) -> jnp.ndarray:
    # HF hidden_activation "gelu_pytorch_tanh"
    return jax.nn.gelu(gate, approximate=True) * up


def _min_period(types: tuple) -> int:
    for p in range(1, len(types) + 1):
        if len(types) % p == 0 and all(
                types[i] == types[i % p] for i in range(len(types))):
            return p
    return len(types)


SUPPORTS_FUSED_DECODE = False  # custom forward, no fused-decode path


@dataclass(frozen=True)
class Gemma2Config:
    vocab_size: int = 256000
    hidden_size: int = 2304
    intermediate_size: int = 9216
    num_hidden_layers: int = 26
    num_attention_heads: int = 8
    num_key_value_heads: int = 4
    head_dim: int = 256
    sliding_window: int = 4096
    query_pre_attn_scalar: float = 256.0
    attn_logit_softcapping: float = 50.0
    final_logit_softcapping: float = 30.0
    rms_norm_eps: float = 1e-6
    rope_theta: float = 10000.0
    max_position_embeddings: int = 8192
    tie_word_embeddings: bool = True
    layer_types: tuple = ()
    eos_token_id: int = 1
    bos_token_id: int = 2
    rope_scaling: Any = None
    num_experts: int = 0
    # --- Gemma-3 knobs (models/gemma3.py) -------------------------------
    # per-head Gemma (1+w) RMSNorm on q/k after the head split
    use_qk_norm: bool = False
    # sliding layers rotate at this base frequency (global layers keep
    # rope_theta + rope_scaling); 0 = one shared table (Gemma-2)
    rope_local_base_freq: float = 0.0

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
        """Attention types in first-appearance order — defines the
        group-index convention shared with kv_cache_group_specs."""
        seen = []
        for t in self.layer_types:
            if t not in seen:
                seen.append(t)
        return seen

    @classmethod
    def from_hf_config(cls, cfg: dict) -> "Gemma2Config":
        keys = ["vocab_size", "hidden_size", "intermediate_size",
                "num_hidden_layers", "num_attention_heads",
                "num_key_value_heads", "head_dim", "sliding_window",
                "query_pre_attn_scalar", "attn_logit_softcapping",
                "final_logit_softcapping", "rms_norm_eps", "rope_theta",
                "max_position_embeddings", "eos_token_id", "bos_token_id"]
        kw = {k: cfg[k] for k in keys if cfg.get(k) is not None}
        if cfg.get("layer_types"):
            kw["layer_types"] = tuple(cfg["layer_types"])
        kw["tie_word_embeddings"] = bool(
            cfg.get("tie_word_embeddings", True))
        return cls(**kw)

    @classmethod
    def from_pretrained(cls, path: str) -> "Gemma2Config":
        with open(os.path.join(path, "config.json")) as f:
            return cls.from_hf_config(json.load(f))


def kv_cache_group_specs(cfg: Gemma2Config, block_size: int,
                         dtype_bytes: int = 2):
    """One KV-cache group per attention type, first-appearance order."""
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


def kv_cache_spec(cfg: Gemma2Config, block_size: int, dtype_bytes: int = 2):
    # Conservative single-spec view (sizing): full attention.
    from vllm_trianglemix_tpu.core.kv_cache_interface import (
        FullAttentionSpec,
    )

    return FullAttentionSpec(block_size=block_size,
                             num_kv_heads=cfg.num_key_value_heads,
                             head_size=padded_head_dim(cfg.head_dim),
                             dtype_bytes=dtype_bytes)


def shape_tree(cfg: Gemma2Config) -> dict:
    L, D = cfg.num_hidden_layers, cfg.hidden_size
    HQ, KH, Dh = (cfg.num_attention_heads, cfg.num_key_value_heads,
                  cfg.head_dim)
    I, V = cfg.intermediate_size, cfg.vocab_size
    layers = {
        "input_layernorm": (L, D),
        "q_proj": (L, D, HQ * Dh),
        "k_proj": (L, D, KH * Dh),
        "v_proj": (L, D, KH * Dh),
        "o_proj": (L, HQ * Dh, D),
        "post_attention_layernorm": (L, D),
        "pre_feedforward_layernorm": (L, D),
        "post_feedforward_layernorm": (L, D),
        "gate_proj": (L, D, I),
        "up_proj": (L, D, I),
        "down_proj": (L, I, D),
    }
    if cfg.use_qk_norm:
        layers["q_norm"] = (L, Dh)
        layers["k_norm"] = (L, Dh)
    tree = {"embed_tokens": (V, D), "layers": layers, "norm": (D,)}
    if not cfg.tie_word_embeddings:
        tree["lm_head"] = (D, V)
    return tree


def init_random(cfg: Gemma2Config, seed: int = 0,
                dtype=jnp.bfloat16) -> dict:
    shapes = shape_tree(cfg)
    leaves, treedef = jax.tree_util.tree_flatten(
        shapes, is_leaf=lambda x: isinstance(x, tuple))
    keys = jax.random.split(jax.random.PRNGKey(seed), len(leaves))

    def init_one(key, shape):
        if (len(shape) <= 2 and shape[-1] in (cfg.hidden_size,
                                              cfg.head_dim)
                and shape[0] != cfg.vocab_size):
            return jnp.zeros(shape, dtype)  # gemma norms: zeros-init (1+w)
        return (jax.random.normal(key, shape, jnp.float32) * 0.02).astype(
            dtype)

    return jax.tree_util.tree_unflatten(
        treedef, [init_one(k, s) for k, s in zip(keys, leaves)])


_NORM_KEYS = ("input_layernorm", "post_attention_layernorm",
              "pre_feedforward_layernorm", "post_feedforward_layernorm")


def params_from_hf_state_dict(cfg: Gemma2Config, get_tensor,
                              dtype=jnp.bfloat16, quant=None) -> dict:
    if quant is not None:
        raise ValueError("quantized Gemma-2 checkpoints not wired yet")
    L = cfg.num_hidden_layers

    # Bare-backbone dumps ("Gemma2Model" embedder row): names lack the
    # "model." prefix — same fallback as the shared decoder loader.
    inner_get = get_tensor

    def get_tensor(name):  # noqa: F811 (deliberate shadow)
        try:
            return inner_get(name)
        except KeyError:
            if name.startswith("model."):
                return inner_get(name[len("model."):])
            raise

    def stack(sub: str, transpose: bool) -> jnp.ndarray:
        mats = []
        for i in range(L):
            w = np.asarray(get_tensor(f"model.layers.{i}.{sub}.weight"))
            mats.append(w.T if transpose else w)
        return jnp.asarray(np.stack(mats), dtype=dtype)

    layers = {}
    for k in _NORM_KEYS:
        layers[k] = stack(k, False)
    for k in ("q_proj", "k_proj", "v_proj", "o_proj"):
        layers[k] = stack(f"self_attn.{k}", True)
    if cfg.use_qk_norm:
        layers["q_norm"] = stack("self_attn.q_norm", False)
        layers["k_norm"] = stack("self_attn.k_norm", False)
    for k in ("gate_proj", "up_proj", "down_proj"):
        layers[k] = stack(f"mlp.{k}", True)

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


def partition_specs(cfg: Gemma2Config, quantized=None) -> dict:
    from jax.sharding import PartitionSpec as P

    layers = {k: P(None, None) for k in _NORM_KEYS}
    layers.update({
        "q_proj": P(None, None, "tp"),
        "k_proj": P(None, None, "tp"),
        "v_proj": P(None, None, "tp"),
        "o_proj": P(None, "tp", None),
        "gate_proj": P(None, None, "tp"),
        "up_proj": P(None, None, "tp"),
        "down_proj": P(None, "tp", None),
    })
    if cfg.use_qk_norm:
        layers["q_norm"] = P(None, None)
        layers["k_norm"] = P(None, None)
    specs = {"embed_tokens": P(None, None), "layers": layers,
             "norm": P(None)}
    if not cfg.tie_word_embeddings:
        specs["lm_head"] = P(None, "tp")
    return specs


def gemma_rms_norm(x: jnp.ndarray, w: jnp.ndarray,
                   eps: float) -> jnp.ndarray:
    xf = x.astype(jnp.float32)
    normed = xf * jax.lax.rsqrt(
        jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
    return (normed * (1.0 + w.astype(jnp.float32))).astype(x.dtype)


# --- forward ------------------------------------------------------------------

def forward(params, cfg: Gemma2Config, tri_cfg, token_ids, kv_caches,
            md, tri_flags, lora=None, kv_quant=None, moe_fn=None,
            fused_decode=False):
    assert not fused_decode, "Gemma-2 fused-decode path not implemented"
    del tri_flags, lora, kv_quant, moe_fn
    L = cfg.num_hidden_layers
    p = cfg.period
    assert L % p == 0
    HQ, KH, Dh = (cfg.num_attention_heads, cfg.num_key_value_heads,
                  cfg.head_dim)
    eps = cfg.rms_norm_eps
    scale = float(cfg.query_pre_attn_scalar) ** -0.5
    group_of = {t: i for i, t in enumerate(cfg.group_order)}

    x = params["embed_tokens"][token_ids]
    x = x * jnp.asarray(cfg.hidden_size ** 0.5, x.dtype)
    cos, sin = rope_cos_sin(
        md.positions, Dh, cfg.rope_theta, dtype=x.dtype,
        scaling=cfg.rope_scaling,
        max_position_embeddings=cfg.max_position_embeddings)
    if cfg.rope_local_base_freq:
        # Gemma-3: sliding layers rotate at the LOCAL base frequency,
        # unscaled (HF Gemma3RotaryEmbedding local/global split).
        cos_l, sin_l = rope_cos_sin(md.positions, Dh,
                                    cfg.rope_local_base_freq,
                                    dtype=x.dtype)
    else:
        cos_l, sin_l = cos, sin

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
        sliding = cfg.layer_types[j] == "sliding_attention"
        window = cfg.sliding_window if sliding else 0
        h = gemma_rms_norm(x, lp["input_layernorm"], eps)
        q = (h @ lp["q_proj"]).reshape(T, HQ, Dh)
        k = (h @ lp["k_proj"]).reshape(T, KH, Dh)
        v = (h @ lp["v_proj"]).reshape(T, KH, Dh)
        if cfg.use_qk_norm:
            q = gemma_rms_norm(q, lp["q_norm"], eps)
            k = gemma_rms_norm(k, lp["k_norm"], eps)
        q, k = apply_rope(q, k, cos_l if sliding else cos,
                          sin_l if sliding else sin)
        kv = write_kv(kv, k, v, mds[j])
        attn = ragged_paged_attention(
            q, kv, mds[j], False, scale=scale,
            soft_cap=float(cfg.attn_logit_softcapping or 0.0),
            attn_window=window, tri_enabled=False)
        h = attn.reshape(T, HQ * Dh) @ lp["o_proj"]
        x = x + gemma_rms_norm(h, lp["post_attention_layernorm"], eps)
        h2 = gemma_rms_norm(x, lp["pre_feedforward_layernorm"], eps)
        mlp = gelu_tanh_and_mul(h2 @ lp["gate_proj"],
                                h2 @ lp["up_proj"]) @ lp["down_proj"]
        return x + gemma_rms_norm(mlp, lp["post_feedforward_layernorm"],
                                  eps), kv

    # period-chunked scan: every window is static inside the chunk body
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
    x = gemma_rms_norm(x, params["norm"], eps)
    return x, new_kv.reshape(kv_caches.shape)


def compute_logits(params, cfg: Gemma2Config, hidden):
    w = (params["embed_tokens"].T if cfg.tie_word_embeddings
         else params["lm_head"])
    logits = jnp.dot(hidden, w, preferred_element_type=jnp.float32)
    cap = cfg.final_logit_softcapping
    if cap:
        logits = cap * jnp.tanh(logits / cap)
    return logits
