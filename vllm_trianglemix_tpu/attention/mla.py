"""Multi-head Latent Attention (MLA) over a paged LATENT cache.

Reference: vLLM's MLA backend family (vllm/v1/attention/backends/mla/
common.py) and the DeepSeek-V2 attention (transformers
models/deepseek_v2/modeling_deepseek_v2.py:300-400).

TPU-native design — **weight absorption everywhere**: instead of caching
per-head K/V (what the reference's "MHA mode" prefill does), the cache
stores one row per token: ``[c_kv (kv_lora_rank) | k_pe (rope_dim)]``.
Queries are absorbed through the kv_b up-projection
(``q_eff = q_nope @ W_UK``), so attention scores become a single dot
against the cached row and the attention VALUE is the latent itself
(up-projected through ``W_UV`` after the softmax). Absorption is exact
(associativity of matmuls); it makes the KV cache
``(rank + rope) / (2·H·head_dim)`` of MHA's — e.g. 576/8192 ≈ 14× smaller
for DeepSeek-V2 — and turns decode into MQA over one fat head, which is
the shape TPUs like (one wide contraction per token instead of H thin
ones).

Current implementation is the XLA semantics path (O(T·max_ctx) gather,
like backend.ragged_paged_attention_xla); a Pallas latent-cache kernel
is the planned fast path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from vllm_trianglemix_tpu.attention.metadata import AttentionMetadata

MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)


def mla_padded_width(width: int) -> int:
    """On TPU the stored latent width pads to the 128-lane boundary so
    the Pallas kernel tiles cleanly (DeepSeek 576 -> 640); zero pad
    lanes contribute nothing to scores or values."""
    from vllm_trianglemix_tpu.attention.backend import padded_head_dim

    return padded_head_dim(width)


def mla_cache_shape(num_blocks: int, block_size: int, width: int):
    """width = kv_lora_rank + qk_rope_head_dim; one row per token."""
    return (num_blocks, block_size, 1, mla_padded_width(width))


def _pad_lanes(x: jnp.ndarray, wp: int) -> jnp.ndarray:
    if x.shape[-1] == wp:
        return x
    pad = [(0, 0)] * (x.ndim - 1) + [(0, wp - x.shape[-1])]
    return jnp.pad(x, pad)


def mla_write_cache(cache: jnp.ndarray, rows: jnp.ndarray,
                    slot_mapping: jnp.ndarray) -> jnp.ndarray:
    """Scatter latent rows [T, W] into the paged cache [nb, page, 1, Wp]."""
    num_blocks, page, _, wp = cache.shape
    rows = _pad_lanes(rows, wp)
    bi = slot_mapping // page
    off = slot_mapping % page
    bi = jnp.where(slot_mapping < 0, num_blocks, bi)
    return cache.at[bi, off, 0].set(rows.astype(cache.dtype), mode="drop")


def mla_paged_attention(q: jnp.ndarray, cache: jnp.ndarray,
                        md: AttentionMetadata, *, scale: float,
                        v_dim: int) -> jnp.ndarray:
    """Dispatch: XLA gather attention by default — the honest
    differenced-chain measurement (scripts/bench_mla_decode.py) puts XLA
    at 22-63 us/layer at the DeepSeek decode shape vs 135-266 us for the
    Pallas latent kernel, so the gather IS the TPU-native fast path here
    (XLA fuses it into the attention contraction). VTT_MLA_KERNEL=1
    opts back into the kernel for A/Bs. ``q`` [T, H, W] pads to the
    cache's stored lane width."""
    from vllm_trianglemix_tpu import envs

    wp = cache.shape[-1]
    if (envs.VTT_MLA_KERNEL and not envs.VTT_DISABLE_PALLAS
            and jax.default_backend() == "tpu"
            and wp % 128 == 0 and v_dim % 128 == 0):
        from vllm_trianglemix_tpu.ops.mla_attention import (
            mla_paged_attention_pallas,
        )

        return mla_paged_attention_pallas(
            _pad_lanes(q, wp), cache, md, scale=scale, v_dim=v_dim)
    return mla_paged_attention_xla(_pad_lanes(q, wp), cache, md,
                                   scale=scale, v_dim=v_dim)


def mla_paged_attention_xla(q: jnp.ndarray, cache: jnp.ndarray,
                            md: AttentionMetadata, *, scale: float,
                            v_dim: int) -> jnp.ndarray:
    """Absorbed MLA attention.

    q: [T, H, W] — per-head absorbed query (q_eff || q_pe), W = rank+rope.
    cache: [nb, page, 1, W] latent rows (already written for this step).
    Returns [T, H, v_dim]: softmax-weighted latent (per head), to be
    up-projected through W_UV by the caller.
    """
    T, H, W = q.shape
    num_blocks, page, _, _ = cache.shape
    R, max_blocks = md.block_tables.shape
    max_ctx = max_blocks * page

    ctx = cache[md.block_tables].reshape(R, max_ctx, W)
    c_t = ctx[md.req_idx].astype(jnp.float32)              # [T, C, W]
    qf = q.astype(jnp.float32) * scale
    scores = jnp.einsum("thw,tcw->thc", qf, c_t)

    key_pos = jnp.arange(max_ctx, dtype=jnp.int32)[None, :]
    q_pos = md.positions[:, None]
    ctx_len = md.seq_lens[md.req_idx][:, None]
    visible = (key_pos <= q_pos) & (key_pos < ctx_len)
    scores = jnp.where(visible[:, None, :], scores, MASK_VALUE)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("thc,tcv->thv", probs, c_t[:, :, :v_dim])
    return out


def rope_interleaved(positions: jnp.ndarray, rope_dim: int, theta: float,
                     dtype=jnp.float32) -> tuple[jnp.ndarray, jnp.ndarray]:
    """cos/sin [T, rope_dim/2] for DeepSeek's complex-pair rope
    (modeling_deepseek_v2.py:apply_rotary_emb — pairs are (x[2i],
    x[2i+1]), NOT the rotate-half halves)."""
    half = rope_dim // 2
    inv = 1.0 / (theta ** (jnp.arange(0, half, dtype=jnp.float32) / half))
    freqs = positions.astype(jnp.float32)[:, None] * inv[None, :]
    return jnp.cos(freqs).astype(dtype), jnp.sin(freqs).astype(dtype)


def apply_rope_interleaved(x: jnp.ndarray, cos: jnp.ndarray,
                           sin: jnp.ndarray) -> jnp.ndarray:
    """x [..., T?, D] with pairs on the last axis; cos/sin [T, D/2]
    broadcast over middle axes."""
    xe = x[..., 0::2]
    xo = x[..., 1::2]
    while cos.ndim < xe.ndim:
        cos = cos[:, None]
        sin = sin[:, None]
    oe = xe * cos - xo * sin
    oo = xe * sin + xo * cos
    return jnp.stack([oe, oo], axis=-1).reshape(x.shape).astype(x.dtype)
