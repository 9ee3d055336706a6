"""Pallas decode-step paged attention — the TPU decode hot path.

Specialization of ops/ragged_paged_attention.py for the pure-decode fused
step (one query token per sequence, the current token's K/V merged from
registers — the shape every multi-step-decode iteration runs). The general
ragged kernel processes each sequence's KV tiles against the WHOLE query
block (q_blk * group rows, 1/q_blk of them live) because prefill rows of
one sequence span many rows; in decode exactly `group` rows per sequence
are live, so the general kernel spends ~8x redundant VPU work (mask /
exp / online-softmax passes over [q_blk*group, tile] instead of
[group, tile]) plus a per-tile [tile_tokens, head_dim] V-zeroing pass.

This kernel (reference decode analog: csrc/attention/paged_attention_v1.cu
and the torch_xla decode path of vllm/v1/attention/backends/pallas.py):

- grid (1,): one program, sequences processed by a scalar while loop with
  an NBUF-deep ring of KV tile buffers: the producer pointer walks the
  flat (seq, tile) work list NBUF slots ahead of the consumer, so several
  sequences' page fetches are in flight at once (decode tiles are small —
  with 1-deep prefetch the DMA engines idle between sequences). Dead
  pages past a sequence's context are never fetched;
- per-sequence query rows are sliced dynamically from the whole-batch q
  block in VMEM ([group, head_dim] per kv head — the only rows that do
  work);
- online softmax with an UNNORMALIZED accumulator carried in registers
  (one divide per sequence at the end, not per tile);
- KV buffers are zeroed ONCE at launch: skipped pages then hold zeros or
  previously-fetched finite cache data, so the per-tile garbage-V
  masking pass of the general kernel is unnecessary (masked columns get
  exactly-zero probabilities: exp(MASK - m) underflows to 0, 0 * finite
  = 0);
- the current token's K/V (`new_kv`, raw model dtype) merge as one extra
  always-visible column per sequence — an outer product on the VPU, no
  MXU pass, and no quantization error for the newest token even when the
  cache is int8/fp8.

Numerics are validated against attention/backend.py's XLA reference in
interpret mode (tests/attention/test_decode_kernel.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vllm_trianglemix_tpu.attention.metadata import AttentionMetadata
from vllm_trianglemix_tpu.ops.ragged_paged_attention import (
    MASK_VALUE,
    _PageBlockCopy,
    _split_kv_heads,
)


def _decode_kernel(
    # scalar prefetch
    kv_lens_ref,        # i32[R] — cached context length (EXCLUDES the
                        # current token); >= 1 for every live sequence
    page_tables_ref,    # i32[R, pages_per_seq]
    num_seqs_ref,       # i32[1]
    # inputs
    q_ref,              # [R, HQ, head_dim] VMEM (whole batch)
    new_ref,            # [R, 2*KH, head_dim] VMEM — current tokens' K/V,
                        # interleaved (K_h at 2h, V_h at 2h+1), raw dtype
    pages_hbm_ref,      # [num_pages, page, 2*KH, head_dim] (HBM)
    # outputs
    o_ref,              # [R, HQ, head_dim] VMEM
    # scratch
    kv_bufs,            # [num_bufs, pages_blk, page, 2*KH, head_dim] VMEM
    sems,               # DMA semaphores [num_bufs]
    *,
    scale: float,
    soft_cap: float,
    k_scale: float | None,
    v_scale: float | None,
    attn_window: int,
):
    R, num_q_heads, head_dim = q_ref.shape
    pages_per_seq = page_tables_ref.shape[1]
    num_seqs = num_seqs_ref[0]
    num_bufs, pages_blk, page_size, combined, _ = kv_bufs.shape
    num_kv_heads = combined // 2
    group = num_q_heads // num_kv_heads
    tile_tokens = pages_blk * page_size
    num_tiles = pl.cdiv(pages_per_seq, pages_blk)  # static upper bound
    packing_q = 32 // (jnp.dtype(q_ref.dtype).itemsize * 8)

    # One-time buffer zeroing: guarantees every stale byte a skipped page
    # leaves behind is finite (see module docstring).
    kv_bufs[...] = jnp.zeros(kv_bufs.shape, kv_bufs.dtype)

    def start_tile_of(seq_idx):
        """First live KV tile of a sequence (sliding window skips the
        lead-in that no visible column can fall in)."""
        if attn_window <= 0:
            return jnp.int32(0)
        win_lo = jnp.maximum(kv_lens_ref[seq_idx] - (attn_window - 1), 0)
        return win_lo // tile_tokens

    def live_tiles_of(seq_idx):
        return pl.cdiv(kv_lens_ref[seq_idx], tile_tokens)

    def start_copy(seq_idx, tile, buf_idx):
        end_page = jnp.minimum(
            pages_per_seq, pl.cdiv(kv_lens_ref[seq_idx], page_size))
        return _PageBlockCopy(
            pages_hbm_ref,
            kv_bufs.at[buf_idx],
            sems.at[buf_idx],
            page_tables_ref,
            seq_idx,
            tile * pages_blk,
            end_page,
        )

    def advance_producer(prod):
        """Issue the fetch at the producer pointer (if live) and step it
        one slot along the flat (seq, tile) work list."""
        prod_seq, prod_tile, prod_ctr = prod

        @pl.when(prod_seq < num_seqs)
        def _issue():
            start_copy(prod_seq, prod_tile, prod_ctr % num_bufs).start()

        safe_seq = jnp.minimum(prod_seq, R - 1)
        last = prod_tile + 1 >= live_tiles_of(safe_seq)
        nxt_seq = lax.select(last, prod_seq + 1, prod_seq)
        nxt_tile = lax.select(
            last, start_tile_of(jnp.minimum(nxt_seq, R - 1)), prod_tile + 1)
        return nxt_seq, nxt_tile, prod_ctr + 1

    # Prologue: fill the ring — up to num_bufs fetches in flight before
    # any compute starts.
    prod0 = (jnp.int32(0), start_tile_of(0), jnp.int32(0))
    for _ in range(num_bufs):
        prod0 = advance_producer(prod0)

    def q_rows(seq_idx, kv_head):
        """Pre-scaled [group, head_dim] query rows for (seq, kv head)."""
        q = q_ref[pl.ds(seq_idx, 1)].reshape(num_q_heads, head_dim)
        q = q[kv_head * group:(kv_head + 1) * group, :]
        if group % packing_q != 0:
            q = q.astype(jnp.float32)
        return (q.astype(jnp.float32) * scale).astype(q_ref.dtype)

    def process_seq(state):
        seq_idx, cons_ctr, prod = state
        kv_len = kv_lens_ref[seq_idx]
        first_tile = start_tile_of(seq_idx)
        n_tiles = live_tiles_of(seq_idx)
        qs = [q_rows(seq_idx, h) for h in range(num_kv_heads)]

        def tile_pending(tile_state):
            tile = tile_state[0]
            return tile < n_tiles

        def process_tile(tile_state):
            tile, cons_ctr, prod, ms, ls, accs = tile_state
            kv_buf = start_copy(seq_idx, tile, cons_ctr % num_bufs).wait()
            kv_flat = kv_buf.reshape(tile_tokens * combined, head_dim)
            tile_start = tile * tile_tokens

            j = lax.broadcasted_iota(jnp.int32, (group, tile_tokens), 1)
            visible = j < (kv_len - tile_start)
            if attn_window > 0:
                # Column pos >= kv_len - (attn_window - 1): the current
                # token occupies one window slot.
                visible &= j >= (kv_len - tile_start - (attn_window - 1))

            packing = 32 // (jnp.dtype(kv_flat.dtype).itemsize * 8)
            load_step = max(1, packing // 2)
            ms_n, ls_n, accs_n = list(ms), list(ls), list(accs)
            for h0 in range(0, num_kv_heads, load_step):
                k_list, v_list = _split_kv_heads(kv_flat, h0, combined,
                                                 load_step)
                for s in range(load_step):
                    h = h0 + s
                    k, v = k_list[s], v_list[s]
                    if k_scale is not None:
                        k = (k.astype(jnp.float32) * k_scale).astype(
                            q_ref.dtype)
                    if v_scale is not None:
                        v = (v.astype(jnp.float32) * v_scale).astype(
                            q_ref.dtype)
                    qk = jnp.einsum("nd,md->nm", qs[h], k,
                                    preferred_element_type=jnp.float32)
                    if soft_cap > 0.0:
                        qk = soft_cap * jnp.tanh(qk / soft_cap)
                    qk = jnp.where(visible, qk, MASK_VALUE)
                    m_curr = jnp.max(qk, axis=1, keepdims=True)
                    m_next = jnp.maximum(ms[h], m_curr)
                    # exp(MASK - m) underflows to exactly 0 for masked
                    # columns; V bytes are finite by the zero-init
                    # invariant, so no V masking pass is needed.
                    s_curr = jnp.exp(qk - m_next)
                    alpha = jnp.exp(ms[h] - m_next)
                    sv = jnp.dot(
                        s_curr.astype(v.dtype) if v.dtype == jnp.bfloat16
                        else s_curr, v,
                        preferred_element_type=jnp.float32)
                    ms_n[h] = m_next
                    ls_n[h] = ls[h] * alpha + s_curr.sum(axis=1,
                                                         keepdims=True)
                    accs_n[h] = accs[h] * alpha + sv
            # Refill the slot this tile just freed (compute reads above
            # are program-ordered before the DMA start, so the
            # write-after-read is safe — same argument as 2-deep double
            # buffering, just num_bufs deep).
            prod_n = advance_producer(prod)
            return (tile + 1, cons_ctr + 1, prod_n, tuple(ms_n),
                    tuple(ls_n), tuple(accs_n))

        neg_inf = jnp.full((group, 1), -jnp.inf, jnp.float32)
        zero_l = jnp.zeros((group, 1), jnp.float32)
        zero_acc = jnp.zeros((group, head_dim), jnp.float32)
        _, cons_ctr, prod, ms, ls, accs = lax.while_loop(
            tile_pending, process_tile,
            (first_tile, cons_ctr, prod,
             tuple(neg_inf for _ in range(num_kv_heads)),
             tuple(zero_l for _ in range(num_kv_heads)),
             tuple(zero_acc for _ in range(num_kv_heads))))

        # Merge the current token's K/V column (always visible, raw model
        # dtype — no cache-quantization round trip): a [group, 1] score
        # and a VPU outer product, no MXU pass.
        new_row = new_ref[pl.ds(seq_idx, 1)].reshape(combined, head_dim)
        out_heads = []
        for h in range(num_kv_heads):
            k_new = new_row[2 * h:2 * h + 1, :].astype(jnp.float32)
            v_new = new_row[2 * h + 1:2 * h + 2, :].astype(jnp.float32)
            qk_new = (qs[h].astype(jnp.float32) * k_new).sum(
                axis=1, keepdims=True)                      # [group, 1]
            if soft_cap > 0.0:
                qk_new = soft_cap * jnp.tanh(qk_new / soft_cap)
            m_next = jnp.maximum(ms[h], qk_new)
            alpha = jnp.exp(ms[h] - m_next)
            s_new = jnp.exp(qk_new - m_next)                # [group, 1]
            l_next = ls[h] * alpha + s_new
            acc = accs[h] * alpha + s_new * v_new           # [group, D]
            out_heads.append(acc / jnp.where(l_next == 0.0, 1.0, l_next))
        out = jnp.concatenate(out_heads, axis=0)            # [HQ, D]
        o_ref[pl.ds(seq_idx, 1)] = out.reshape(
            1, num_q_heads, head_dim).astype(o_ref.dtype)
        return seq_idx + 1, cons_ctr, prod

    lax.while_loop(lambda s: s[0] < num_seqs, process_seq,
                   (jnp.int32(0), jnp.int32(0), prod0))
    del num_tiles  # static bound only documents the tile loop's range


def _tile_ladder(pages_per_seq: int, page_bytes: int) -> list[int]:
    """Static tile-width candidates (in pages), capped by the per-slot
    VMEM budget. Dead page slots in a tile cost VPU work (the mask/exp/
    update passes run over the full tile width), so the best tile hugs
    the batch's longest live context — measured 37 vs 29 us/layer for 5
    live pages in an 8- vs 5-page tile (scripts/profile_decode_kernel.py).
    But every ladder entry is a separate Mosaic compile in EVERY jit
    bucket that embeds the switch: a ~25%-spaced ladder (~15 variants)
    multiplied warmup into an ~18-minute stall (round-3 bench log). Four
    factor-2 steps hugging the top of the range bound dead work at <2x on
    the final tile while keeping warmup tractable; short contexts run the
    smallest tile over multiple loop iterations."""
    tile_budget = 4 * 1024 * 1024
    cap = max(1, min(pages_per_seq, tile_budget // page_bytes))
    return sorted({max(1, cap >> s) for s in range(4)})


@functools.partial(
    jax.jit,
    static_argnames=("scale", "soft_cap", "k_scale", "v_scale",
                     "attn_window", "num_kv_pages_per_block",
                     "num_bufs", "vmem_limit_bytes", "interpret"))
def decode_paged_attention_pallas(
    q: jax.Array,            # [R, num_q_heads, head_dim] — row i = seq i
    kv_cache: jax.Array,     # [num_pages, page, 2*KH interleaved, head_dim]
    md: AttentionMetadata,   # seq_lens EXCLUDES the current token
    new_kv: jax.Array,       # [R, 2*KH, head_dim] current-token K/V
    *,
    scale: float,
    soft_cap: float = 0.0,
    k_scale: float | None = None,
    v_scale: float | None = None,
    attn_window: int = 0,
    num_kv_pages_per_block: int | None = None,
    num_bufs: int | None = None,
    vmem_limit_bytes: int | None = None,
    interpret: bool = False,
):
    R, num_q_heads, head_dim = q.shape
    _, page_size, combined, _ = kv_cache.shape
    pages_per_seq = md.block_tables.shape[1]
    page_bytes = page_size * combined * head_dim * kv_cache.dtype.itemsize

    def make(pages_blk: int):
        nb = num_bufs
        if nb is None:
            # Ring deep enough to keep several sequences' fetches in
            # flight; 4 measured best (deeper pays launch-time zeroing
            # and scalar bookkeeping for no extra overlap).
            ring_budget = 16 * 1024 * 1024
            nb = max(2, min(4, ring_budget // (pages_blk * page_bytes)))
        return pl.pallas_call(
            functools.partial(
                _decode_kernel,
                scale=scale, soft_cap=soft_cap,
                k_scale=k_scale, v_scale=v_scale,
                attn_window=attn_window),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=3,
                in_specs=[
                    pl.BlockSpec((R, num_q_heads, head_dim),
                                 lambda *_: (0, 0, 0)),
                    pl.BlockSpec((R, combined, head_dim),
                                 lambda *_: (0, 0, 0)),
                    pl.BlockSpec(memory_space=pl.ANY),
                ],
                out_specs=pl.BlockSpec((R, num_q_heads, head_dim),
                                       lambda *_: (0, 0, 0)),
                grid=(1,),
                scratch_shapes=[
                    pltpu.VMEM(
                        (nb, pages_blk, page_size, combined, head_dim),
                        kv_cache.dtype),
                    pltpu.SemaphoreType.DMA((nb,)),
                ],
            ),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
                vmem_limit_bytes=vmem_limit_bytes or 64 * 1024 * 1024,
            ),
            out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
            name="vtt_decode_paged_attention",
            interpret=interpret,
        )

    num_seqs = jnp.asarray(md.num_reqs, jnp.int32).reshape(1)
    args = (
        md.seq_lens.astype(jnp.int32),
        md.block_tables.astype(jnp.int32),
        num_seqs,
        q, new_kv, kv_cache,
    )

    if num_kv_pages_per_block is not None:
        return make(min(pages_per_seq, num_kv_pages_per_block))(*args)

    ladder = _tile_ladder(pages_per_seq, page_bytes)
    if attn_window > 0:
        # A window spans at most cdiv(window, page) + 1 pages (straddle).
        wcap = min(pages_per_seq, -(-attn_window // page_size) + 1)
        ladder = sorted({min(p, wcap) for p in ladder})
    if len(ladder) == 1:
        return make(ladder[0])(*args)

    # Context-matched tile, chosen DYNAMICALLY: all ladder variants live
    # in one compiled graph behind a lax.switch, so the tile tracks the
    # batch's longest live context with zero recompilation (the width is
    # a perf knob only — every variant is correct for any context).
    live = jnp.arange(R, dtype=jnp.int32) < num_seqs[0]
    max_kv = jnp.max(jnp.where(live, args[0], 0))
    pages_needed = jnp.maximum(-(-max_kv // page_size), 1)
    sel = jnp.clip(
        jnp.searchsorted(jnp.asarray(ladder, jnp.int32), pages_needed),
        0, len(ladder) - 1)
    branches = [functools.partial(lambda k, ops: k(*ops), make(p))
                for p in ladder]
    return lax.switch(sel, branches, args)
