"""Decode context parallelism: KV shards + log-sum-exp merge.

Role of the reference's DCP (decode_context_parallel_size,
config/parallel.py:198; scheduler block math sched/scheduler.py:105;
cross-rank merge via csrc merge_attn_states): one sequence's KV cache is
split across `cp` devices so decode attention reads 1/cp of the context
per chip. TPU-native design: the paged KV cache is sharded on the PAGE
axis round-robin (page p lives on shard p % cp), each shard runs masked
attention over its own pages, and the partial (max, sum, weighted-out)
stats merge with a numerically-stable log-sum-exp combine inside a
``shard_map`` — the collectives ride ICI via ``jax.lax`` psum/pmax.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from vllm_trianglemix_tpu.attention.metadata import AttentionMetadata

MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)


def _partial_attention(q, k_t, v_t, visible, scale):
    """Masked attention partials for a KV subset.

    q [T, KH, G, D] f32; k_t/v_t [T, C, KH, D]; visible bool[T, C].
    Returns (m [T,KH,G], l [T,KH,G], o [T,KH,G,D]) — running-softmax
    stats mergeable across shards.
    """
    scores = jnp.einsum("tkgd,tckd->tkgc", q * scale, k_t)
    scores = jnp.where(visible[:, None, None, :], scores, MASK_VALUE)
    m = jnp.max(scores, axis=-1)
    s = jnp.exp(scores - m[..., None])
    # fully-masked shards: exp(MASK - MASK) = 1 rows; zero them via l
    s = jnp.where(visible[:, None, None, :], s, 0.0)
    l = jnp.sum(s, axis=-1)
    o = jnp.einsum("tkgc,tckd->tkgd", s, v_t)
    return m, l, o


def merge_partials(m, l, o, axis_name: str):
    """Cross-shard LSE merge (the reference's merge_attn_states role)."""
    m_max = jax.lax.pmax(m, axis_name)
    corr = jnp.exp(m - m_max)
    l_sum = jax.lax.psum(l * corr, axis_name)
    o_sum = jax.lax.psum(o * corr[..., None], axis_name)
    return o_sum / jnp.maximum(l_sum, 1e-30)[..., None]


def dcp_write_and_attention(
    q: jnp.ndarray,           # [T, HQ, D]
    k_new: jnp.ndarray,       # [T, KH, D]
    v_new: jnp.ndarray,       # [T, KH, D]
    kv_cache: jnp.ndarray,    # [num_pages, page, 2*KH, D], sharded on the
                              # page axis over cp (shard-major layout:
                              # global page p lives on shard p % cp at
                              # local row p // cp)
    md: AttentionMetadata,
    mesh,
    *,
    scale: float,
    cp_axis: str = "cp",
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Engine-path DCP layer step: scatter this step's K/V rows into the
    owning shard's pages, then context-parallel attention with LSE merge
    (reference scheduler+merge integration, sched/scheduler.py:105 +
    merge_attn_states). Block tables and slot mappings stay GLOBAL page
    ids — ownership (page % cp) is resolved inside the shard_map, so the
    scheduler/runner need no DCP-specific host math.

    Returns (attn [T, HQ, D], updated kv_cache).
    """
    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map

    cp = mesh.shape[cp_axis]
    num_pages, page, twoKH, D = kv_cache.shape
    KH = twoKH // 2
    T, HQ, _ = q.shape
    G = HQ // KH
    R, max_blocks = md.block_tables.shape
    C = max_blocks * page
    pp = num_pages // cp

    def body(kv_local, q_full, k_n, v_n, slot_mapping, block_tables,
             seq_lens, req_idx, positions):
        my = jax.lax.axis_index(cp_axis)
        # --- local scatter write (rows whose page this shard owns) ---
        p_ids = slot_mapping // page
        off = slot_mapping % page
        owned_w = (slot_mapping >= 0) & (p_ids % cp == my)
        lrow = jnp.where(owned_w, p_ids // cp, pp)  # OOB rows dropped
        kv_rows = jnp.stack([k_n, v_n], axis=2).reshape(
            T, twoKH, k_n.shape[-1])
        if kv_rows.shape[-1] != D:  # lane-padded cache (TPU)
            kv_rows = jnp.pad(kv_rows, ((0, 0), (0, 0),
                                        (0, D - kv_rows.shape[-1])))
        kv_local = kv_local.at[lrow, off].set(
            kv_rows.astype(kv_local.dtype), mode="drop")

        # --- local masked attention over owned pages ---
        bt = block_tables
        owned = (bt % cp) == my
        pages = kv_local[jnp.where(owned, bt // cp, 0)]
        pages = pages.reshape(R, C, twoKH, D)
        k = pages[:, :, 0::2, :].astype(jnp.float32)
        v = pages[:, :, 1::2, :].astype(jnp.float32)
        k_t = k[req_idx]
        v_t = v[req_idx]

        key_pos = jnp.arange(C, dtype=jnp.int32)[None, :]
        q_pos = positions[:, None]
        ctx = seq_lens[req_idx][:, None]
        visible = (key_pos <= q_pos) & (key_pos < ctx)
        visible &= jnp.repeat(owned, page, axis=1)[req_idx]

        Dq = q_full.shape[-1]
        qf = q_full.reshape(T, KH, G, Dq).astype(jnp.float32)
        if Dq != D:
            qf = jnp.pad(qf, ((0, 0), (0, 0), (0, 0), (0, D - Dq)))
        m, l, o = _partial_attention(qf, k_t, v_t, visible, scale)
        out = merge_partials(m, l, o, cp_axis)
        return (out[..., :Dq].reshape(T, HQ, Dq).astype(q_full.dtype),
                kv_local)

    fn = shard_map(
        body,
        mesh=mesh,
        in_specs=(P(cp_axis, None, None, None), P(None, None, None),
                  P(None, None, None), P(None, None, None), P(None),
                  P(None, None), P(None), P(None), P(None)),
        out_specs=(P(None, None, None), P(cp_axis, None, None, None)),
    )
    return fn(kv_cache, q, k_new, v_new, md.slot_mapping, md.block_tables,
              md.seq_lens, md.req_idx, md.positions)


def dcp_ragged_attention(
    q: jnp.ndarray,           # [T, HQ, D]
    kv_cache: jnp.ndarray,    # [num_pages, page, 2*KH interleaved, D]
    md: AttentionMetadata,
    mesh,
    *,
    scale: float,
    cp_axis: str = "cp",
) -> jnp.ndarray:
    """Context-parallel paged decode attention under shard_map.

    The caller shards ``kv_cache`` pages round-robin over ``cp_axis``
    (page p on shard p % cp). Each shard attends only to columns whose
    page it owns; partial stats merge with LSE. Query/metadata are
    replicated over ``cp_axis``.
    """
    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map

    cp = mesh.shape[cp_axis]
    num_pages, page, twoKH, D = kv_cache.shape
    KH = twoKH // 2
    T, HQ, _ = q.shape
    G = HQ // KH
    R, max_blocks = md.block_tables.shape
    C = max_blocks * page

    if num_pages % cp != 0:
        raise ValueError(f"{num_pages=} must be divisible by cp={cp}")

    # Reorder pages shard-major (shard s holds pages {p : p % cp == s}
    # contiguously) so an even page-axis split realizes round-robin
    # ownership: shard_major[s*pp + r] = page (s + r*cp).
    order = jnp.arange(num_pages).reshape(-1, cp).T.reshape(-1)

    def local_attn(kv_local, q_full, block_tables, seq_lens, req_idx,
                   positions):
        my = jax.lax.axis_index(cp_axis)
        # Global page id -> local row, valid only for owned pages.
        bt = block_tables
        owned = (bt % cp) == my
        local_rows = bt // cp
        pages = kv_local[local_rows]                 # [R, MB, page, 2KH, D]
        pages = pages.reshape(R, C, twoKH, D)
        k = pages[:, :, 0::2, :].astype(jnp.float32)
        v = pages[:, :, 1::2, :].astype(jnp.float32)
        k_t = k[req_idx]
        v_t = v[req_idx]

        key_pos = jnp.arange(C, dtype=jnp.int32)[None, :]
        q_pos = positions[:, None]
        ctx = seq_lens[req_idx][:, None]
        visible = (key_pos <= q_pos) & (key_pos < ctx)
        # column is visible on this shard only if its page is owned
        col_owned = jnp.repeat(owned, page, axis=1)[req_idx]
        visible &= col_owned

        qf = q_full.reshape(T, KH, G, D).astype(jnp.float32)
        m, l, o = _partial_attention(qf, k_t, v_t, visible, scale)
        out = merge_partials(m, l, o, cp_axis)
        return out.reshape(T, HQ, D).astype(q_full.dtype)

    fn = shard_map(
        local_attn,
        mesh=mesh,
        in_specs=(P(cp_axis, None, None, None), P(None, None), P(None, None),
                  P(None), P(None), P(None)),
        out_specs=P(None, None, None),
    )
    # Shard pages round-robin: gather pages in shard-major order so the
    # even split over the page axis gives shard s pages {p: p % cp == s}.
    shard_major = kv_cache[order]
    return fn(shard_major, q, md.block_tables, md.seq_lens, md.req_idx,
              md.positions)
