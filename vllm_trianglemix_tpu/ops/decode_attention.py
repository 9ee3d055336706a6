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

- grid (1,): one program; sequences are processed in BLOCKS of
  ``s_blk`` (up to 8) so every VPU/MXU op covers s_blk sequences at
  once — batched [s_blk, group, tile] softmax passes and batched
  dot_general MXU calls. The round-4 per-sequence loop issued ~128 tiny
  [group, tile] op sequences per layer and was bound by per-iteration
  scalar/loop overhead (~38 us/layer at the bench shape, ~3x the
  byte floor);
- an NBUF-deep ring of KV tile buffers, each slot holding all s_blk
  sequences' page blocks: the producer pointer walks the flat
  (seq-block, tile) work list NBUF slots ahead of the consumer, so
  several blocks' page fetches are in flight at once. Dead pages past a
  sequence's context are never fetched;
- online softmax with an UNNORMALIZED accumulator carried in registers
  (one divide per sequence block at the end, not per tile);
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
    kv_bufs,            # [num_bufs, s_blk, pages_blk, page, 2*KH, head_dim]
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
    num_bufs, s_blk, pages_blk, page_size, combined, _ = kv_bufs.shape
    num_kv_heads = combined // 2
    group = num_q_heads // num_kv_heads
    tile_tokens = pages_blk * page_size
    num_blks = R // s_blk
    live_blks = pl.cdiv(num_seqs, s_blk)

    def len_of(seq_idx):
        """Context length, 0 for rows past num_seqs (their kv_lens pad
        values are unspecified)."""
        s = jnp.minimum(seq_idx, R - 1)
        return lax.select(seq_idx < num_seqs, kv_lens_ref[s], 0)

    def blk_max_len(blk):
        b = jnp.minimum(blk, num_blks - 1)
        m = len_of(b * s_blk)
        for i in range(1, s_blk):
            m = jnp.maximum(m, len_of(b * s_blk + i))
        return m

    def start_tile_of(blk):
        """First live KV tile of a sequence block (sliding window skips
        the lead-in no visible column can fall in — block-level min so
        every member sequence's window is covered)."""
        if attn_window <= 0:
            return jnp.int32(0)
        b = jnp.minimum(blk, num_blks - 1)
        lo = None
        for i in range(s_blk):
            wl = jnp.maximum(len_of(b * s_blk + i) - (attn_window - 1), 0)
            lo = wl if lo is None else jnp.minimum(lo, wl)
        return lo // tile_tokens

    def blk_tiles(blk):
        return pl.cdiv(blk_max_len(blk), tile_tokens)

    def copies_for(blk, tile, buf_idx):
        """Unconditional page copies for every member sequence: pages
        past a sequence's context fetch its page 0 instead of being
        skipped, so every VMEM slot byte is always REAL (finite) cache
        data and no launch-time buffer zeroing is needed. (The round-4
        skip-and-zero-once scheme re-zeroed the whole ring on every
        kernel call — with sequence-blocked slots that zeroing, not the
        attention math, dominated the decode step.) Out-of-context
        columns still mask to exactly-zero probability via
        exp(MASK - m) underflow; the clamped fetch costs at most
        pages_blk - 1 wasted page reads per sequence on its last tile."""
        out = []
        for i in range(s_blk):
            s = jnp.minimum(blk * s_blk + i, R - 1)
            end_page = jnp.maximum(
                jnp.minimum(pages_per_seq,
                            pl.cdiv(len_of(blk * s_blk + i), page_size)),
                1)
            copies = []
            for p in range(pages_blk):
                page = tile * pages_blk + p
                clamped = jnp.minimum(page, end_page - 1)
                copies.append(pltpu.make_async_copy(
                    pages_hbm_ref.at[page_tables_ref[s, clamped]],
                    kv_bufs.at[buf_idx, i, p],
                    sems.at[buf_idx],
                ))
            out.extend(copies)
        return out

    def advance_producer(prod):
        """Issue the fetches at the producer pointer (if live) and step
        it one slot along the flat (seq-block, tile) work list."""
        prod_blk, prod_tile, prod_ctr = prod

        @pl.when(prod_blk < live_blks)
        def _issue():
            for c in copies_for(prod_blk, prod_tile, prod_ctr % num_bufs):
                c.start()

        last = prod_tile + 1 >= blk_tiles(prod_blk)
        nxt_blk = lax.select(last, prod_blk + 1, prod_blk)
        nxt_tile = lax.select(last, start_tile_of(nxt_blk), prod_tile + 1)
        return nxt_blk, nxt_tile, prod_ctr + 1

    # Prologue: fill the ring — up to num_bufs block-fetches in flight
    # before any compute starts.
    prod0 = (jnp.int32(0), start_tile_of(jnp.int32(0)), jnp.int32(0))
    for _ in range(num_bufs):
        prod0 = advance_producer(prod0)

    def q_block(blk, kv_head):
        """Pre-scaled [s_blk, group, head_dim] query rows."""
        q = q_ref[pl.ds(blk * s_blk, s_blk),
                  kv_head * group:(kv_head + 1) * group, :]
        return (q.astype(jnp.float32) * scale).astype(q_ref.dtype)

    def process_blk(state):
        blk, cons_ctr, prod = state
        s0 = blk * s_blk
        lens = [len_of(s0 + i) for i in range(s_blk)]
        # [s_blk, 1, 1] per-sequence limits for broadcasted masking
        lim3 = jnp.concatenate(
            [jnp.full((1, 1, 1), lens[i], jnp.int32)
             for i in range(s_blk)], axis=0)
        first_tile = start_tile_of(blk)
        n_tiles = blk_tiles(blk)
        qs = [q_block(blk, h) for h in range(num_kv_heads)]

        def tile_pending(tile_state):
            return tile_state[0] < n_tiles

        def process_tile(tile_state):
            tile, cons_ctr, prod, ms, ls, accs = tile_state
            for c in copies_for(blk, tile, cons_ctr % num_bufs):
                c.wait()
            # keep a REF view (not a load): _split_kv_heads bitcasts the
            # ref for the packed bf16 K/V split
            kv_flat = kv_bufs.at[cons_ctr % num_bufs].reshape(
                s_blk * tile_tokens * combined, head_dim)
            tile_start = tile * tile_tokens

            t = lax.broadcasted_iota(jnp.int32, (s_blk, 1, tile_tokens), 2)
            visible = t < (lim3 - tile_start)
            if attn_window > 0:
                # Column pos >= kv_len - (attn_window - 1): the current
                # token occupies one window slot.
                visible &= t >= (lim3 - tile_start - (attn_window - 1))

            packing = 32 // (jnp.dtype(kv_flat.dtype).itemsize * 8)
            load_step = max(1, packing // 2)
            ms_n, ls_n, accs_n = list(ms), list(ls), list(accs)
            for h0 in range(0, num_kv_heads, load_step):
                k_list, v_list = _split_kv_heads(kv_flat, h0, combined,
                                                 load_step)
                for s in range(load_step):
                    h = h0 + s
                    # [s_blk, tile_tokens, head_dim] per-sequence K/V
                    k = k_list[s].reshape(s_blk, tile_tokens, head_dim)
                    v = v_list[s].reshape(s_blk, tile_tokens, head_dim)
                    if k_scale is not None:
                        k = (k.astype(jnp.float32) * k_scale).astype(
                            q_ref.dtype)
                    if v_scale is not None:
                        v = (v.astype(jnp.float32) * v_scale).astype(
                            q_ref.dtype)
                    qk = lax.dot_general(
                        qs[h], k, (((2,), (2,)), ((0,), (0,))),
                        preferred_element_type=jnp.float32,
                    )                              # [s_blk, group, tile]
                    if soft_cap > 0.0:
                        qk = soft_cap * jnp.tanh(qk / soft_cap)
                    qk = jnp.where(visible, qk, MASK_VALUE)
                    m_curr = jnp.max(qk, axis=2, keepdims=True)
                    m_next = jnp.maximum(ms[h], m_curr)
                    # exp(MASK - m) underflows to exactly 0 for masked
                    # columns; V bytes are finite by the zero-init
                    # invariant, so no V masking pass is needed.
                    s_curr = jnp.exp(qk - m_next)
                    alpha = jnp.exp(ms[h] - m_next)
                    sv = lax.dot_general(
                        s_curr.astype(v.dtype) if v.dtype == jnp.bfloat16
                        else s_curr, v,
                        (((2,), (1,)), ((0,), (0,))),
                        preferred_element_type=jnp.float32,
                    )                              # [s_blk, group, head]
                    ms_n[h] = m_next
                    ls_n[h] = ls[h] * alpha + s_curr.sum(axis=2,
                                                         keepdims=True)
                    accs_n[h] = accs[h] * alpha + sv
            # Refill the slot this tile just freed (compute reads above
            # are program-ordered before the DMA start, so the
            # write-after-read is safe — same argument as 2-deep double
            # buffering, just num_bufs deep).
            prod_n = advance_producer(prod)
            return (tile + 1, cons_ctr + 1, prod_n, tuple(ms_n),
                    tuple(ls_n), tuple(accs_n))

        neg_inf = jnp.full((s_blk, group, 1), -jnp.inf, jnp.float32)
        zero_l = jnp.zeros((s_blk, group, 1), jnp.float32)
        zero_acc = jnp.zeros((s_blk, group, head_dim), jnp.float32)
        _, cons_ctr, prod, ms, ls, accs = lax.while_loop(
            tile_pending, process_tile,
            (first_tile, cons_ctr, prod,
             tuple(neg_inf for _ in range(num_kv_heads)),
             tuple(zero_l for _ in range(num_kv_heads)),
             tuple(zero_acc for _ in range(num_kv_heads))))

        # Merge the current tokens' K/V column (always visible, raw model
        # dtype — no cache-quantization round trip): [s_blk, group, 1]
        # scores and a VPU outer product, no MXU pass.
        new_blk = new_ref[pl.ds(s0, s_blk)]        # [s_blk, 2KH, head]
        out_heads = []
        for h in range(num_kv_heads):
            k_new = new_blk[:, 2 * h:2 * h + 1, :].astype(jnp.float32)
            v_new = new_blk[:, 2 * h + 1:2 * h + 2, :].astype(jnp.float32)
            qf = qs[h].astype(jnp.float32)
            qk_new = (qf * k_new).sum(axis=2, keepdims=True)
            if soft_cap > 0.0:
                qk_new = soft_cap * jnp.tanh(qk_new / soft_cap)
            m_next = jnp.maximum(ms[h], qk_new)
            alpha = jnp.exp(ms[h] - m_next)
            s_new = jnp.exp(qk_new - m_next)       # [s_blk, group, 1]
            l_next = ls[h] * alpha + s_new
            acc = accs[h] * alpha + s_new * v_new  # [s_blk, group, head]
            out_heads.append(
                acc / jnp.where(l_next == 0.0, 1.0, l_next))
        out = jnp.concatenate(out_heads, axis=1)   # [s_blk, HQ, head]
        o_ref[pl.ds(s0, s_blk)] = out.astype(o_ref.dtype)
        return blk + 1, cons_ctr, prod

    lax.while_loop(lambda s: s[0] < live_blks, process_blk,
                   (jnp.int32(0), jnp.int32(0), prod0))


def _seq_block(R: int, group: int) -> int:
    """Sequences batched per compute round: the widest divisor of R that
    keeps the batched row count (s_blk * group) within one or two
    sublane tiles — past that the VPU work stops amortizing overhead and
    starts paying for itself."""
    for s in (8, 4, 2, 1):
        if R % s == 0 and s * group <= 64:
            return s
    return 1


def _tile_ladder(pages_per_seq: int, page_bytes: int, s_blk: int) -> list[int]:
    """Static tile-width candidates (in pages), capped by the per-slot
    VMEM budget (a slot now holds s_blk sequences' tiles). Dead page
    slots in a tile cost VPU work (the mask/exp/update passes run over
    the full tile width), so the best tile hugs the batch's longest live
    context. But every ladder entry is a separate Mosaic compile in
    EVERY jit bucket that embeds the switch: a ~25%-spaced ladder (~15
    variants) multiplied warmup into an ~18-minute stall (round-3 bench
    log). Four factor-2 steps hugging the top of the range bound dead
    work at <2x on the final tile while keeping warmup tractable; short
    contexts run the smallest tile over multiple loop iterations."""
    tile_budget = 8 * 1024 * 1024
    cap = max(1, min(pages_per_seq, tile_budget // (page_bytes * s_blk)))
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
    group = num_q_heads // (combined // 2)
    s_blk = _seq_block(R, max(group, 1))

    def make(pages_blk: int):
        nb = num_bufs
        slot_bytes = s_blk * pages_blk * page_bytes
        if nb is None:
            # Ring deep enough to keep several blocks' fetches in
            # flight; deeper pays launch-time zeroing and scalar
            # bookkeeping for no extra overlap.
            ring_budget = 16 * 1024 * 1024
            nb = max(2, min(4, ring_budget // slot_bytes))
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
                        (nb, s_blk, pages_blk, page_size, combined,
                         head_dim),
                        kv_cache.dtype),
                    pltpu.SemaphoreType.DMA((nb,)),
                ],
            ),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
                vmem_limit_bytes=vmem_limit_bytes or 100 * 1024 * 1024,
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

    ladder = _tile_ladder(pages_per_seq, page_bytes, s_blk)
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
    # Target >= ~4 tiles per context rather than one covering tile: the
    # clamped-fetch scheme pays real DMA for oversized last tiles, and
    # the measured sweep (v5e, 32 seqs, ctx 500/550) puts 1-page tiles at
    # 27-30 us/layer vs 37-52 us for covering tiles once the context
    # straddles a tile boundary; larger tiles only amortize loop
    # overhead at long contexts where they are a small fraction.
    live = jnp.arange(R, dtype=jnp.int32) < num_seqs[0]
    max_kv = jnp.max(jnp.where(live, args[0], 0))
    pages_needed = jnp.maximum(-(-max_kv // page_size), 1)
    target = jnp.maximum(pages_needed // 4, 1)
    sel = jnp.clip(
        jnp.searchsorted(jnp.asarray(ladder, jnp.int32), target,
                         side="right") - 1,
        0, len(ladder) - 1)
    branches = [lambda a, p=p: make(p)(*a) for p in ladder]
    return lax.switch(sel, branches, args)
