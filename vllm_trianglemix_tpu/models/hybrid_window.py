"""Hybrid sliding/full attention over the generic decoder block.

Shared machinery for llama-canonical families whose layers alternate
sliding-window and full attention by a fixed pattern — OLMo-3, EXAONE-4,
Cohere2 (reference olmo3.py / exaone4.py / commandr.py sliding layers).
Gemma-2/3 carry their own variant (models/gemma2.py) because of the
gemma norms; everything here runs through decoder._layer_compute, so all
generic knobs (postnorm, parallel blocks, qk-norm layouts, biases)
compose.

TPU-native shape (gemma2.py's proven pattern): layers scan in
PERIOD-sized chunks — the minimal repeat of ``layer_types`` — so every
per-layer window is a STATIC attention-kernel parameter, and each chunk
position selects its rope table statically:

- sliding layers rotate with the plain-theta table;
- full layers use ``full_attention_rope``: "scaled" (OLMo-3: the
  config's rope_scaling applies ONLY to full layers; sliding layers run
  unscaled — HF Olmo3RotaryEmbedding rope_type="default") or "none"
  (EXAONE-4 / Cohere2 global NoPE layers skip rotary entirely).

The engine carves the KV cache into one group per attention type with
per-group block tables (kv_cache_group_specs; the sliding group's
manager reclaims out-of-window blocks). forward() also accepts
single-group metadata (md.block_tables_g=None) — windows are then
enforced by masking alone.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from vllm_trianglemix_tpu.attention.backend import (
    padded_head_dim,
    ragged_paged_attention,
    write_kv,
)
from vllm_trianglemix_tpu.models import decoder as _dec

SUPPORTS_FUSED_DECODE = False  # chunked scan; single-step decode only


def min_period(types: tuple) -> int:
    for p in range(1, len(types) + 1):
        if len(types) % p == 0 and all(
                types[i] == types[i % p] for i in range(len(types))):
            return p
    return len(types)


def group_order(types: tuple) -> list:
    seen = []
    for t in types:
        if t not in seen:
            seen.append(t)
    return seen


def kv_cache_group_specs(cfg, block_size: int, dtype_bytes: int = 2):
    """One KV-cache group per attention type, first-appearance order
    (gemma2.py convention, shared with the runner's group plumbing)."""
    from vllm_trianglemix_tpu.core.kv_cache_interface import (
        FullAttentionSpec,
        KVCacheGroupSpec,
        SlidingWindowSpec,
    )

    out = []
    for t in group_order(cfg.layer_types):
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


def kv_cache_spec(cfg, block_size: int, dtype_bytes: int = 2):
    # Conservative single-spec sizing view: full attention.
    from vllm_trianglemix_tpu.core.kv_cache_interface import (
        FullAttentionSpec,
    )

    return FullAttentionSpec(block_size=block_size,
                             num_kv_heads=cfg.num_key_value_heads,
                             head_size=padded_head_dim(cfg.head_dim),
                             dtype_bytes=dtype_bytes)


def forward(params, cfg, tri_cfg, token_ids, kv_caches, md, tri_flags,
            lora=None, kv_quant=None, moe_fn=None, fused_decode=False):
    """Period-chunked scan. Returns (hidden[T, D], new kv_caches)."""
    assert not fused_decode, \
        "hybrid-window fused-decode path not implemented (chunked scan)"
    del lora, moe_fn
    L = cfg.num_hidden_layers
    types = cfg.layer_types
    assert len(types) == L
    p = min_period(types)

    x = params["embed_tokens"][token_ids]
    if cfg.embedding_multiplier != 1.0:
        x = x * jnp.asarray(cfg.embedding_multiplier, x.dtype)
    rot_dim = int(cfg.head_dim * cfg.partial_rotary_factor) // 2 * 2
    cos_s, sin_s = _dec.rope_cos_sin(
        md.positions, rot_dim, cfg.rope_theta, dtype=x.dtype,
        max_position_embeddings=cfg.max_position_embeddings)
    full_mode = getattr(cfg, "full_attention_rope", "scaled")
    if full_mode == "none":
        cos_f = sin_f = None
    elif cfg.rope_scaling is not None:
        cos_f, sin_f = _dec.rope_cos_sin(
            md.positions, rot_dim, cfg.rope_theta, dtype=x.dtype,
            scaling=cfg.rope_scaling,
            max_position_embeddings=cfg.max_position_embeddings)
    else:
        cos_f, sin_f = cos_s, sin_s

    attn_kwargs = _dec.build_attn_kwargs(cfg, tri_cfg, kv_quant)
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
        sliding = types[j] == "sliding_attention"
        kwargs = dict(attn_kwargs,
                      attn_window=cfg.sliding_window if sliding else 0)
        kept = {}

        def attn_of(q, k, v):
            kept["kv"] = write_kv(kv, k, v, mds[j], kv_quant=kv_quant)
            return ragged_paged_attention(q, kept["kv"], mds[j], tri_j,
                                          **kwargs)

        cos, sin = (cos_s, sin_s) if sliding else (cos_f, sin_f)
        x = _dec._layer_compute(x, lp, {}, None, cfg, cos, sin,
                                attn_of, None)
        return x, kept["kv"]

    chunked = jax.tree_util.tree_map(
        lambda a: a.reshape(L // p, p, *a.shape[1:]), params["layers"])
    kv_chunked = kv_caches.reshape(L // p, p, *kv_caches.shape[1:])
    tri_chunked = tri_flags.reshape(L // p, p)

    def chunk_fn(x, scanned):
        lp_c, kv_c, tri_c = scanned
        new_kv = []
        for j in range(p):
            lp = jax.tree_util.tree_map(lambda a: a[j], lp_c)
            x, kv_j = sub_layer(x, lp, kv_c[j], tri_c[j], j)
            new_kv.append(kv_j)
        return x, jnp.stack(new_kv)

    x, new_kv = jax.lax.scan(chunk_fn, x, (chunked, kv_chunked,
                                           tri_chunked))
    x = _dec.decoder_norm(x, params["norm"], cfg,
                          params.get("norm_bias"))
    return x, new_kv.reshape(kv_caches.shape)
