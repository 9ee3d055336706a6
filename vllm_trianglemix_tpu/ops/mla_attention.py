"""Pallas MLA latent-cache attention — the DeepSeek decode fast path.

Role of the reference's MLA backend family (vllm/v1/attention/backends/
mla/common.py + flashmla/cutlass kernels): absorbed multi-head latent
attention is MQA over ONE fat shared head — every query head scores
against the same cached ``[c_kv | k_pe]`` row (W = kv_lora_rank +
qk_rope_head_dim, e.g. 576) and the attention VALUE is the first
``v_dim`` (= kv_lora_rank) lanes of that same row. One kernel serves
ragged mixed prefill + decode, replacing the O(T × max_ctx) XLA gather
(attention/mla.py:mla_paged_attention_xla — kept as the numerics
reference and the CPU path).

Structure follows ops/ragged_paged_attention.py where it applies
(scalar-prefetched ragged geometry, scaled-iota visibility, online
softmax in fp32 scratch, per-(seq, q-block) row-masked stores), with a
simpler per-program double-buffered page DMA: the KV row IS both K and
V, so there is no head interleave to split and a single buffered tile
feeds both matmuls.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vllm_trianglemix_tpu.attention.metadata import AttentionMetadata

MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)


def _kernel(
    # scalar prefetch
    kv_lens_ref,       # i32[R]
    page_tables_ref,   # i32[R, pages_per_seq]
    cu_q_lens_ref,     # i32[R + 1]
    num_seqs_ref,      # i32[1]
    # inputs
    q_ref,             # [q_blk, H, Wp]  (pre-scaled)
    pages_hbm_ref,     # [nb, page, Wp]  (HBM)
    # outputs
    o_ref,             # [q_blk, H, v_dim]
    # scratch
    kv_bufs,           # [2, kv_pages_blk, page, Wp]
    sems,              # DMA sems [2]
    l_ref,             # f32[q_blk * H, 128]
    m_ref,             # f32[q_blk * H, 128]
    acc_ref,           # f32[q_blk, H, v_dim]
    *,
    v_dim: int,
):
    q_blk_size, H, Wp = q_ref.shape
    _, kv_pages_blk, page_size, _ = kv_bufs.shape
    kv_blk_size = kv_pages_blk * page_size
    pages_per_seq = page_tables_ref.shape[1]
    num_seqs = num_seqs_ref[0]
    q_blk_idx = pl.program_id(0)
    q_lo = q_blk_idx * q_blk_size
    rows = q_blk_size * H

    def start_copy(seq_idx, kv_blk, buf):
        end_page = jnp.minimum(pages_per_seq,
                               pl.cdiv(kv_lens_ref[seq_idx], page_size))
        for i in range(kv_pages_blk):
            pg = kv_blk * kv_pages_blk + i

            @pl.when(pg < end_page)
            def _():
                pltpu.make_async_copy(
                    pages_hbm_ref.at[page_tables_ref[seq_idx, pg]],
                    kv_bufs.at[buf, i],
                    sems.at[buf],
                ).start()

    def wait_copy(seq_idx, kv_blk, buf):
        end_page = jnp.minimum(pages_per_seq,
                               pl.cdiv(kv_lens_ref[seq_idx], page_size))
        for i in range(kv_pages_blk):
            pg = kv_blk * kv_pages_blk + i

            @pl.when(pg < end_page)
            def _():
                pltpu.make_async_copy(
                    pages_hbm_ref.at[page_tables_ref[seq_idx, pg]],
                    kv_bufs.at[buf, i],
                    sems.at[buf],
                ).wait()

    # first seq overlapping this q block
    def find_seq0(r, s):
        return lax.select(cu_q_lens_ref[r + 1] <= q_lo, r + 1, s)

    seq0 = lax.fori_loop(0, num_seqs, find_seq0, 0,
                         unroll=False)

    def seq_overlaps(seq_idx):
        return (seq_idx < num_seqs) \
            & (cu_q_lens_ref[jnp.minimum(seq_idx, num_seqs - 1)]
               < q_lo + q_blk_size)

    def seq_pending(state):
        seq_idx, _ = state
        return seq_overlaps(seq_idx) & (seq_idx >= seq0)

    def process_seq(state):
        seq_idx, ctr0 = state
        q_start = cu_q_lens_ref[seq_idx]
        q_end = cu_q_lens_ref[seq_idx + 1]
        kv_len = kv_lens_ref[seq_idx]
        q_len = q_end - q_start
        row_lo = jnp.maximum(q_start, q_lo)
        row_hi = jnp.minimum(q_end, q_lo + q_blk_size) - 1
        pos_hi = kv_len - q_len + (row_hi - q_start)
        eff_kv_len = jnp.minimum(kv_len, pos_hi + 1)
        n_tiles = pl.cdiv(eff_kv_len, kv_blk_size)
        base = kv_len - q_len + q_lo - q_start   # row i -> pos base + i//H

        store_lo = jnp.maximum(q_start - q_lo, 0)
        store_hi = jnp.minimum(q_end - q_lo, q_blk_size)
        i_lm = lax.broadcasted_iota(jnp.int32, (rows, 128), 0)
        lm_mask = (i_lm >= store_lo * H) & (i_lm < store_hi * H)
        i_acc = lax.broadcasted_iota(jnp.int32, (q_blk_size, H, v_dim), 0)
        acc_mask = (i_acc >= store_lo) & (i_acc < store_hi)

        q = q_ref[...].reshape(rows, Wp)

        def tile_body(t, ctr):
            buf = lax.rem(ctr, 2)
            # Prefetch the NEXT tile in the global walk — the next tile
            # of this sequence, or the next overlapping sequence's first
            # tile — into the other buffer while this one computes.
            nxt_buf = lax.rem(ctr + 1, 2)

            @pl.when(t + 1 < n_tiles)
            def _prefetch_same():
                start_copy(seq_idx, t + 1, nxt_buf)

            @pl.when((t + 1 >= n_tiles) & seq_overlaps(seq_idx + 1))
            def _prefetch_next_seq():
                start_copy(seq_idx + 1, 0, nxt_buf)

            wait_copy(seq_idx, t, buf)
            kv = kv_bufs[buf].reshape(kv_blk_size, Wp)
            kv_pos0 = t * kv_blk_size

            qk = jnp.einsum("nd,md->nm", q, kv,
                            preferred_element_type=jnp.float32)
            i = lax.broadcasted_iota(jnp.int32, qk.shape, 0)
            j = lax.broadcasted_iota(jnp.int32, qk.shape, 1)
            causal_rhs = (j + (kv_pos0 - base)) * H
            visible = (i >= causal_rhs) & (j < kv_len - kv_pos0)
            qk = jnp.where(visible, qk, MASK_VALUE)

            init = t == 0
            m_curr = jnp.max(qk, axis=1, keepdims=True)
            s_curr = jnp.exp(qk - m_curr)
            v = kv[:, :v_dim]
            col_ok = (lax.broadcasted_iota(jnp.int32, v.shape, 0)
                      < (kv_len - kv_pos0))
            v = jnp.where(col_ok, v, jnp.zeros_like(v))
            sv = jnp.dot(s_curr.astype(v.dtype)
                         if v.dtype == jnp.bfloat16 else s_curr, v,
                         preferred_element_type=jnp.float32)
            l_curr = s_curr.sum(axis=1, keepdims=True)

            lm_shape = (rows, 128)
            m_curr_b = jnp.broadcast_to(m_curr, lm_shape)
            l_curr_b = jnp.broadcast_to(l_curr, lm_shape)
            m_prev = jnp.where(init, jnp.full(lm_shape, -jnp.inf),
                               m_ref[...])
            l_prev = jnp.where(init, jnp.zeros(lm_shape), l_ref[...])
            m_next = jnp.maximum(m_prev, m_curr_b)
            alpha = jnp.exp(m_prev - m_next)
            beta = jnp.exp(m_curr_b - m_next)
            l_alpha = alpha * l_prev
            l_next = l_alpha + beta * l_curr_b
            l_safe = jnp.where(l_next == 0.0, 1.0, l_next)
            pltpu.store(m_ref, m_next, mask=lm_mask)
            pltpu.store(l_ref, l_safe, mask=lm_mask)

            def cols_to(arr, n):
                if arr.shape[1] >= n:
                    return arr[:, :n]
                return jnp.concatenate([arr] * (n // arr.shape[1]),
                                       axis=1)

            o_prev = jnp.where(init, 0.0,
                               acc_ref[...]).reshape(rows, v_dim)
            out = lax.div(cols_to(l_alpha, v_dim) * o_prev
                          + cols_to(beta, v_dim) * sv,
                          cols_to(l_safe, v_dim))
            pltpu.store(acc_ref, out.reshape(q_blk_size, H, v_dim),
                        mask=acc_mask)
            return ctr + 1

        ctr_end = lax.fori_loop(0, n_tiles, tile_body, ctr0,
                                unroll=False)
        return seq_idx + 1, ctr_end

    # Seed the pipeline: the first overlapping sequence's first tile.
    @pl.when(seq_overlaps(seq0))
    def _seed():
        start_copy(seq0, 0, 0)

    lax.while_loop(seq_pending, process_seq, (seq0, 0))
    o_ref[...] = acc_ref[...].astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("scale", "v_dim", "num_kv_pages_per_block",
                     "num_queries_per_block", "interpret"))
def mla_paged_attention_pallas(
    q: jax.Array,          # [T, H, Wp] absorbed queries (q_eff || q_pe)
    cache: jax.Array,      # [nb, page, 1, Wp] latent rows
    md: AttentionMetadata,
    *,
    scale: float,
    v_dim: int,
    num_kv_pages_per_block: int | None = None,
    num_queries_per_block: int | None = None,
    interpret: bool = False,
):
    T, H, Wp = q.shape
    nb, page, _, _ = cache.shape
    R, pages_per_seq = md.block_tables.shape
    assert Wp % 128 == 0 and v_dim % 128 == 0, (Wp, v_dim)

    kv_pages = num_kv_pages_per_block or max(
        1, min(pages_per_seq, -(-512 // page)))
    # rows = q_blk * H bounds the fp32 acc (rows * v_dim * 4B) and the
    # fat qk tile: target ~1024 rows (8 tokens at DeepSeek's 128 heads,
    # 64 tokens at 16 heads).
    q_blk = num_queries_per_block or max(1, min(64, max(8, 1024 // H)))
    q_blk = min(q_blk, max(T, 1))

    grid = (-(-T // q_blk),)
    qs = (q.astype(jnp.float32) * scale).astype(q.dtype)
    pages_flat = cache.reshape(nb, page, Wp)

    out = pl.pallas_call(
        functools.partial(_kernel, v_dim=v_dim),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=grid,
            in_specs=[
                pl.BlockSpec((q_blk, H, Wp), lambda i, *_: (i, 0, 0)),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec((q_blk, H, v_dim),
                                   lambda i, *_: (i, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((2, kv_pages, page, Wp), cache.dtype),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.VMEM((q_blk * H, 128), jnp.float32),
                pltpu.VMEM((q_blk * H, 128), jnp.float32),
                pltpu.VMEM((q_blk, H, v_dim), jnp.float32),
            ],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        out_shape=jax.ShapeDtypeStruct((T, H, v_dim), jnp.float32),
        name="vtt_mla_paged_attention",
        interpret=interpret,
    )(md.seq_lens.astype(jnp.int32),
      md.block_tables.astype(jnp.int32),
      md.query_start_loc.astype(jnp.int32),
      jnp.asarray(md.num_reqs, jnp.int32).reshape(1),
      qs, pages_flat)
    return out
