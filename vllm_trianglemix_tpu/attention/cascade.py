"""Cascade attention: shared-prefix KV is attended ONCE for the batch.

Reference: the cascade path of vllm/v1/worker/gpu_model_runner.py:1268
(_compute_cascade_attn_prefix_len) + flash_attn.py's cascade kernels.
When every scheduled request shares the same leading KV blocks (system
prompts, n>1 sampling, prefix-cache hits), per-request paged attention
re-reads those pages once PER REQUEST. Here the shared prefix is
gathered once and attended as one dense [T_all, shared] pass — big MXU
matmuls instead of R repeated page walks — and each request's suffix
runs a masked per-request pass; the two partials merge with the same
numerically-stable LSE combine the DCP shards use
(parallel/dcp.py:merge_partials role, local form).

Both passes are plain XLA (the MXU eats the dense shapes directly); the
Pallas kernel keeps the non-cascade path. Gating (worker/model_runner.py
_detect_cascade): single KV group, no TriangleMix / sliding window /
chunked-local / spec drafts, every request's computed prefix covers the
shared region, and at least ``min_shared_blocks`` blocks are shared.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

MASK_VALUE = -2.381976426469702e38  # matches ops/ragged_paged_attention.py


def _merge(m1, l1, o1, m2, l2, o2):
    """Local two-way LSE merge of running-softmax partials."""
    m = jnp.maximum(m1, m2)
    c1 = jnp.exp(m1 - m)
    c2 = jnp.exp(m2 - m)
    l = l1 * c1 + l2 * c2
    o = o1 * c1[..., None] + o2 * c2[..., None]
    return o / jnp.maximum(l, 1e-30)[..., None]


@partial(jax.jit, static_argnames=("scale", "soft_cap"))
def cascade_ragged_attention(
    q: jnp.ndarray,               # [T, HQ, D]
    kv_cache: jnp.ndarray,        # [num_blocks, page, 2*KH, D]
    md,                           # AttentionMetadata with shared_* set
    *,
    scale: float,
    soft_cap: float = 0.0,
) -> jnp.ndarray:
    T, HQ, D = q.shape
    _, page, twoKH, _ = kv_cache.shape
    KH = twoKH // 2
    G = HQ // KH
    R, max_blocks = md.block_tables.shape

    qf = (q.reshape(T, KH, G, D).astype(jnp.float32)) * scale
    shared_len = md.shared_prefix_len                     # int32[]

    # --- shared pass: every query vs the ONE gathered prefix -----------
    sp = kv_cache[jnp.clip(md.shared_block_tables, 0, None)]
    S = sp.shape[0] * page
    sp = sp.reshape(S, twoKH, D)
    ks = sp[:, 0::2, :].astype(jnp.float32)               # [S, KH, D]
    vs = sp[:, 1::2, :].astype(jnp.float32)
    s_scores = jnp.einsum("tkgd,skd->tkgs", qf, ks)
    if soft_cap > 0.0:
        s_scores = soft_cap * jnp.tanh(s_scores / soft_cap)
    s_vis = (jnp.arange(S, dtype=jnp.int32) < shared_len)[None, None,
                                                          None, :]
    s_scores = jnp.where(s_vis, s_scores, MASK_VALUE)
    m1 = jnp.max(s_scores, axis=-1)
    e1 = jnp.where(s_vis, jnp.exp(s_scores - m1[..., None]), 0.0)
    l1 = jnp.sum(e1, axis=-1)
    o1 = jnp.einsum("tkgs,skd->tkgd", e1, vs)

    # --- suffix pass: per-request keys beyond the shared prefix --------
    pages = kv_cache[md.block_tables].reshape(R, max_blocks * page,
                                              twoKH, D)
    C = max_blocks * page
    k_t = pages[md.req_idx][:, :, 0::2, :].astype(jnp.float32)
    v_t = pages[md.req_idx][:, :, 1::2, :].astype(jnp.float32)
    key_pos = jnp.arange(C, dtype=jnp.int32)[None, :]
    q_pos = md.positions[:, None]
    ctx = md.seq_lens[md.req_idx][:, None]
    vis = ((key_pos <= q_pos) & (key_pos < ctx)
           & (key_pos >= shared_len))                    # [T, C]
    x_scores = jnp.einsum("tkgd,tckd->tkgc", qf, k_t)
    if soft_cap > 0.0:
        x_scores = soft_cap * jnp.tanh(x_scores / soft_cap)
    x_scores = jnp.where(vis[:, None, None, :], x_scores, MASK_VALUE)
    m2 = jnp.max(x_scores, axis=-1)
    e2 = jnp.where(vis[:, None, None, :],
                   jnp.exp(x_scores - m2[..., None]), 0.0)
    l2 = jnp.sum(e2, axis=-1)
    o2 = jnp.einsum("tkgc,tckd->tkgd", e2, v_t)

    out = _merge(m1, l1, o1, m2, l2, o2)                  # [T, KH, G, D]
    return out.reshape(T, HQ, D).astype(q.dtype)
