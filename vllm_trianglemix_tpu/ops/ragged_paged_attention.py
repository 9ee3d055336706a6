"""Pallas ragged paged attention — the TPU hot path.

One kernel serves mixed prefill + decode over a paged KV cache (the role of
the reference's csrc/attention/paged_attention_v{1,2}.cu and of the external
torch_xla `ragged_paged_attention` op its TPU backend calls,
vllm/v1/attention/backends/pallas.py:286). Unlike both, TriangleMix
structured sparsity is fused *into* the kernel:

- exact per-token triangle visibility (reference semantics
  vllm/attention/trianglemix_attention.py:53-198, see
  attention/trianglemix.py) applied inside the flash-attention inner loop;
- whole KV blocks in the "middle Q-K" region are *skipped* — no DMA, no
  FLOPs — via a block-level jump in the KV loop (the block-sparse idea of
  ascend_npu_trianglemix.py:80-124, executed for real);
- causal block pruning: a query block never iterates KV blocks entirely in
  its causal future (a win over dense ragged kernels for long prefill).

Design (TPU-first):
- grid (num_head_blocks, num_q_blocks) over the flat ragged token axis;
- scalar-prefetched metadata (seq lens, page tables, cumulative query
  lens, prompt lens) drives double-buffered HBM->VMEM page DMA;
- online-softmax (flash) accumulation in fp32 VMEM scratch;
- K/V interleaved on the head axis of each page (K_h at 2h, V_h at 2h+1)
  so sub-32-bit dtypes can be split with bitcast tricks, not strided
  gathers;
- ALL visibility predicates (causal, kv-range, TriangleMix row/column
  rules) are evaluated as scaled-iota integer compares — `i//g >= c` is
  rewritten `i >= g*c` so the GQA row->token division never touches the
  VPU, and one select applies the combined mask (measured ~0.4 ms/layer
  of masking VPU time at 8k-token prefill with the naive formulation);
- fused decode: the current token's K/V ride in VMEM as an extra
  "diagonal" tile merged into the online softmax in-kernel
  (`new_kv` input), so a decode step needs NO stats outputs, NO
  external LSE merge, and exactly one cache-write launch for all
  layers afterwards.

The XLA-native reference implementation with identical numerics lives in
attention/backend.py (ragged_paged_attention_xla); tests compare the two in
interpret mode.
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
_I32_MIN = jnp.iinfo(jnp.int32).min
_I32_MAX = jnp.iinfo(jnp.int32).max


def _dtype_packing(dtype) -> int:
    return 32 // (jnp.dtype(dtype).itemsize * 8)


def _xla_tileable(x: int, packing: int) -> bool:
    if x % packing != 0:
        return False
    x //= packing
    return x in (1, 2, 4, 8) or x % 8 == 0


def select_head_block(num_q_heads: int, num_combined_kv_heads: int,
                      q_dtype, kv_dtype) -> tuple[int, int]:
    """Pick (q_heads_per_blk, combined_kv_heads_per_blk) that tile cleanly.

    Splitting the head axis bounds VMEM for many-head models while keeping
    each block XLA-fully-tiled for its dtype packing.
    """
    q_packing = _dtype_packing(q_dtype)
    kv_packing = _dtype_packing(kv_dtype)
    if not _xla_tileable(num_combined_kv_heads, kv_packing):
        raise ValueError(
            f"{num_combined_kv_heads=} not tileable for {kv_dtype=}")
    num_kv_heads = num_combined_kv_heads // 2
    assert num_q_heads % num_kv_heads == 0
    group = num_q_heads // num_kv_heads
    max_combined_tile = 8 * kv_packing
    min_combined = (max_combined_tile
                    if num_combined_kv_heads % max_combined_tile == 0
                    else num_combined_kv_heads)
    min_q = (min_combined // 2) * group
    if _xla_tileable(min_q, q_packing):
        return min_q, min_combined
    return num_q_heads, num_combined_kv_heads


def default_block_sizes(page_size: int, max_q_tokens: int,
                        pages_per_seq: int,
                        q_heads_blk: int = 8,
                        combined_kv_blk: int = 16) -> tuple[int, int]:
    """(num_kv_pages_per_blk, num_q_per_blk) heuristic.

    Large KV tiles amortize the per-unit DMA-issue + inner-loop latency
    that dominates decode (measured ~15x at 512-token vs 256-token tiles
    on v5e); the fp32 accumulator and double-buffered KV pages must still
    fit the ~16 MB VMEM budget, so both dimensions scale down with the
    head-block width.
    """
    import os

    # Out-of-range pages no longer cost DMA (conditional per-page copies),
    # so large tiles amortize the per-tile fixed cost (DMA issue + inner
    # loop + flash update) without streaming garbage; 512 tokens measured
    # best on v5e for <=16 combined heads at the old unconditional copies.
    kv_target = 512 if combined_kv_blk <= 16 else 256
    if max_q_tokens <= 64 and combined_kv_blk <= 16:
        # Decode-shaped batch: one tile covering the whole per-seq context
        # minimizes per-tile fixed costs (DMA issue + inner-loop + flash
        # update) now that out-of-range pages are skipped, measured 3.98
        # vs 4.47 ms/step at the bench shape (profile_decode_ablate).
        kv_target = 1024
    kv_pages = max(1, min(pages_per_seq, -(-kv_target // page_size)))
    # acc scales with q_heads_blk: 128 rows works up to 16 heads/block.
    q_cap = 128 if q_heads_blk <= 16 else 64
    num_q = max(8, min(q_cap, max_q_tokens))
    if max_q_tokens <= 64:
        # Decode-shaped batch (one token per seq): small q blocks bound
        # the redundant rows each per-seq KV tile multiplies against
        # (every row of a q block is matmul'd with every overlapping
        # seq's KV and masked after).
        num_q = min(num_q, 8)
    if os.environ.get("VTT_ATTN_KV_PAGES"):
        kv_pages = min(pages_per_seq, int(os.environ["VTT_ATTN_KV_PAGES"]))
    if os.environ.get("VTT_ATTN_QBLK"):
        num_q = int(os.environ["VTT_ATTN_QBLK"])
    return kv_pages, num_q


class _PageBlockCopy:
    """Async-copy descriptor for one block of KV pages (HBM -> VMEM).

    Pages past the sequence's last page are SKIPPED outright (no DMA
    issue, no bandwidth): a decode tile covering a 520-token context at
    512-token tiles would otherwise stream 3 garbage pages for its second
    tile. The start/wait predicates are identical, so semaphore signals
    stay paired."""

    def __init__(self, pages_hbm_ref, vmem_buf, sem, page_tables_ref,
                 seq_idx, start_page, end_page):
        self._buf = vmem_buf
        self._items = []
        for i in range(vmem_buf.shape[0]):
            page = start_page + i
            valid = page < end_page
            clamped = lax.select(valid, page, 0)
            self._items.append((valid, pltpu.make_async_copy(
                pages_hbm_ref.at[page_tables_ref[seq_idx, clamped]],
                vmem_buf.at[i],
                sem,
            )))

    @staticmethod
    def _guarded(valid, fn):
        @pl.when(valid)
        def _():
            fn()

    def start(self):
        for valid, c in self._items:
            self._guarded(valid, c.start)

    def wait(self):
        for valid, c in self._items:
            self._guarded(valid, c.wait)
        return self._buf


def _split_kv_heads(kv_ref, kv_head_start: int, num_combined: int,
                    load_step: int):
    """Split interleaved rows (K_h at 2h, V_h at 2h+1) into per-head K/V.

    kv_ref: [rows, head_dim] flattened (page*token, combined_head) rows.
    Returns (k_list, v_list) of [rows / num_combined, head_dim] each, for
    `load_step` consecutive kv heads starting at kv_head_start.
    """
    packing = _dtype_packing(kv_ref.dtype)
    start = kv_head_start * 2
    if packing == 1:
        return ([kv_ref[start + 2 * s::num_combined, :]
                 for s in range(load_step)],
                [kv_ref[start + 2 * s + 1::num_combined, :]
                 for s in range(load_step)])
    if kv_ref.dtype == jnp.bfloat16:
        assert packing == 2 and start % 2 == 0
        packed = kv_ref.bitcast(jnp.uint32)
        b = packed[start // 2::num_combined // 2, :]
        # Each packed word holds K (low sublane) and V (high sublane).
        k = pltpu.bitcast(b << 16, jnp.float32).astype(jnp.bfloat16)
        v = pltpu.bitcast(b & jnp.uint32(0xFFFF0000),
                          jnp.float32).astype(jnp.bfloat16)
        return [k], [v]
    if packing == 4:
        # 8-bit KV (int8 / fp8 e4m3): one packed word holds sublanes
        # (K_h, V_h, K_{h+1}, V_{h+1}); shift-extract each byte lane.
        assert start % 4 == 0
        packed = kv_ref.bitcast(jnp.uint32)
        b = packed[start // 4::num_combined // 4, :]
        k_list, v_list = [], []
        for i in range(0, 4, 2):
            bk = (b >> (i * 8)).astype(jnp.uint8)
            bv = (b >> ((i + 1) * 8)).astype(jnp.uint8)
            k_list.append(pltpu.bitcast(bk, kv_ref.dtype))
            v_list.append(pltpu.bitcast(bv, kv_ref.dtype))
        return k_list, v_list
    raise NotImplementedError(f"kv dtype {kv_ref.dtype}")


def _kernel(
    # scalar prefetch
    kv_lens_ref,        # i32[R]
    page_tables_ref,    # i32[R, pages_per_seq]
    cu_q_lens_ref,      # i32[R + 1]
    prompt_lens_ref,    # i32[R]
    tri_flag_ref,       # i32[1] — this layer uses TriangleMix
    num_seqs_ref,       # i32[1]
    # inputs ([sinks_ref f32[num_q_heads] when has_sinks, then]
    # q_ref [q_blk, q_heads_blk, head_dim],
    # pages_hbm_ref [num_pages, page, combined_heads, head_dim] (HBM))
    *rest,
    scale: float,
    sink: int,
    window: int,
    last: int,
    dense_threshold: int,
    soft_cap: float,
    k_scale: float | None,
    v_scale: float | None,
    row_offset: int = 0,
    merge_new_kv: bool = False,
    attn_window: int = 0,
    tri_enabled: bool = True,
    has_sinks: bool = False,
):
    if has_sinks:
        # Learned attention-sink logits (GPT-OSS): an extra softmax column
        # per head, applied as a final denominator correction (see the
        # block past the seq loop). Forces the merge path so l/m scratch
        # is always populated.
        sinks_ref, *rest = rest
    else:
        sinks_ref = None
    q_ref, pages_hbm_ref, *rest = rest
    if merge_new_kv:
        # new_ref: [q_blk, combined_heads_blk, head_dim] — the current
        # tokens' K/V, blocked like q (fused decode).
        (new_ref, o_ref, state_ref, kv_bufs, sems, l_ref, m_ref,
         acc_ref) = rest
    else:
        # state_ref: i32[8] SMEM, persists across programs (only scratch
        # does): [0]=consumer resume seq, [1]=consumer tile counter,
        # [2..5]=producer walk position (heads, q blk, seq, kv blk),
        # [6]=producer tile counter.
        # kv_bufs: [NBUF, kv_pages_blk, page, combined_blk, head_dim]
        # VMEM ring; sems: DMA semaphores [NBUF]; l/m:
        # f32[kv_heads_blk, q*group, 128]; acc: f32[q_blk, q_heads, head].
        new_ref = None
        o_ref, state_ref, kv_bufs, sems, l_ref, m_ref, acc_ref = rest
    q_blk_size, q_heads_blk, head_dim = q_ref.shape
    pages_per_seq = page_tables_ref.shape[1]
    num_seqs = num_seqs_ref[0]
    num_bufs, kv_pages_blk, page_size, combined_blk, _ = kv_bufs.shape
    kv_heads_blk = combined_blk // 2
    kv_blk_size = kv_pages_blk * page_size
    group = q_heads_blk // kv_heads_blk
    heads_blk_idx, q_blk_idx = pl.program_id(0), pl.program_id(1)
    num_heads_blks = pl.num_programs(0)
    assert last >= 1, "TriangleMix num_last_tokens must be >= 1"

    q_len_start = q_blk_idx * q_blk_size
    q_len_end = q_len_start + q_blk_size
    # tri_enabled is STATIC (TriangleMixConfig.enabled): when the engine
    # runs dense, every TriangleMix predicate (3 extra [rows, cols] VPU
    # compares per tile + the block-jump scalar plan) is compiled out
    # instead of being evaluated against an always-false traced flag.
    tri_on = (tri_flag_ref[0] > 0) if tri_enabled else False

    def seq_q_span(seq_idx, q_lo=None):
        """A sequence's query-row overlap with the q block starting at
        token q_lo (default: the current program's), as absolute token
        positions [pos_lo, pos_hi] plus lengths."""
        if q_lo is None:
            q_lo = q_len_start
        q_start = cu_q_lens_ref[seq_idx]
        q_end = cu_q_lens_ref[seq_idx + 1]
        kv_len = kv_lens_ref[seq_idx]
        q_len = q_end - q_start
        row_lo = jnp.maximum(q_start, q_lo)
        row_hi = jnp.minimum(q_end, q_lo + q_blk_size) - 1
        # row_offset shifts query positions past the stored KV length
        # (fused decode: the current token's K/V ride in VMEM, the cache
        # holds only positions < kv_len).
        pos_lo = kv_len - q_len + row_offset + (row_lo - q_start)
        pos_hi = kv_len - q_len + row_offset + (row_hi - q_start)
        return q_start, q_end, q_len, kv_len, pos_lo, pos_hi

    def triangle_block_plan(seq_idx, q_lo=None):
        """(tri_active, skip_from_blk, resume_blk, eff_kv_len) for a
        (seq, q block) pair.

        When every overlapping query row is a middle prefill row, KV blocks
        in (skip_from_blk, resume_blk) are invisible: past the sink region
        and before every row's sliding window. eff_kv_len prunes blocks in
        the causal future of the whole q block.
        """
        _, _, q_len, kv_len, pos_lo, pos_hi = seq_q_span(seq_idx, q_lo)
        n = prompt_lens_ref[seq_idx]
        all_prefill = pos_hi < n
        no_last_rows = (n - pos_hi) >= last
        tri_active = (tri_on & (n > dense_threshold) & all_prefill
                      & no_last_rows)
        # First kv block after the sink region.
        skip_from_blk = sink // kv_blk_size + 1
        # First kv block any row's window reaches.
        win_lo = jnp.maximum(pos_lo - window, 0)
        resume_blk = win_lo // kv_blk_size
        eff_kv_len = jnp.minimum(kv_len, pos_hi + 1)
        return tri_active, skip_from_blk, resume_blk, eff_kv_len

    def eff_kv_len_of(seq_idx, q_lo=None):
        """Causal block pruning: KV past the q block's last row is dead."""
        _, _, _, kv_len, _, pos_hi = seq_q_span(seq_idx, q_lo)
        return jnp.minimum(kv_len, pos_hi + 1)

    def next_kv_blk(kv_blk, seq_idx, q_lo=None):
        """KV block iteration order with the TriangleMix middle-jump and
        the sliding-window lead-in skip."""
        nxt = kv_blk + 1
        if tri_enabled:
            tri_active, skip_from, resume, _ = triangle_block_plan(
                seq_idx, q_lo)
            jump = tri_active & (nxt >= skip_from) & (nxt < resume)
            nxt = lax.select(jump, resume, nxt)
        if attn_window > 0:
            # Sliding-window attention: blocks entirely before every
            # overlapping row's window are dead. Block 0 is still
            # processed (fully masked) to keep the DMA pipeline's
            # prefetch walk simple; the jump starts there.
            _, _, _, _, pos_lo, _ = seq_q_span(seq_idx, q_lo)
            win_lo = jnp.maximum(pos_lo - (attn_window - 1), 0)
            nxt = jnp.maximum(nxt, win_lo // kv_blk_size)
        return nxt

    def start_copy(heads_blk, seq_idx, kv_blk, buf_idx):
        heads_start = heads_blk * combined_blk
        end_page = jnp.minimum(pages_per_seq,
                               pl.cdiv(kv_lens_ref[seq_idx], page_size))
        return _PageBlockCopy(
            pages_hbm_ref.at[:, :, pl.ds(heads_start, combined_blk), :],
            kv_bufs.at[buf_idx],
            sems.at[buf_idx],
            page_tables_ref,
            seq_idx,
            kv_blk * kv_pages_blk,
            end_page,
        )

    # --- NBUF-deep DMA ring -------------------------------------------------
    # A 2-deep (one-program-lookahead) pipeline exposes the ~13 us
    # HBM->VMEM round trip on every tile when per-program compute is
    # shorter (measured: one bare 512 KB copy costs ~14 us/program while a
    # trivial same-grid kernel costs 0.05 us). Instead a producer walks
    # the full (heads blk, q blk, seq, kv blk) tile order NBUF tiles ahead
    # of the consumer, its position carried across programs in SMEM. The
    # walk mirrors the consumer's iteration exactly (same triangle jumps /
    # window skips / causal pruning), so every issued fetch is consumed in
    # order. Pipeline contract: every sequence with index < num_seqs has
    # kv_len >= 1 and q_len >= 1.
    total_q = cu_q_lens_ref[num_seqs]

    def prod_advance(state):
        """Issue the fetch at the producer position and step the walk."""
        ph, pq, ps, pk, ctr = state
        live = (ph < num_heads_blks) & (num_seqs > 0)

        @pl.when(live)
        def _issue():
            start_copy(ph, ps, pk, lax.rem(ctr, num_bufs)).start()

        ps_c = jnp.minimum(ps, jnp.maximum(num_seqs - 1, 0))
        q_lo = pq * q_blk_size
        nk = next_kv_blk(pk, ps_c, q_lo)
        tiles_done = nk * kv_blk_size >= eff_kv_len_of(ps_c, q_lo)
        # Within the q block: next seq if this one ends inside it, else
        # the same seq continues into the next q block.
        q_end = cu_q_lens_ref[ps_c + 1]
        blk_end = q_lo + q_blk_size
        seq_ends_in_blk = q_end <= blk_end
        ns = lax.select(seq_ends_in_blk, ps + 1, ps)
        ns_c = jnp.minimum(ns, num_seqs)
        move_q = ((~seq_ends_in_blk) | (ns >= num_seqs)
                  | (cu_q_lens_ref[ns_c] >= blk_end))
        nq = lax.select(move_q, pq + 1, pq)
        head_done = move_q & ((ns >= num_seqs)
                              | (nq * q_blk_size >= total_q))
        nxt_ph = lax.select(tiles_done & head_done, ph + 1, ph)
        nxt_pq = lax.select(tiles_done,
                            lax.select(head_done, 0, nq), pq)
        nxt_ps = lax.select(tiles_done,
                            lax.select(head_done, 0, ns), ps)
        nxt_pk = lax.select(tiles_done, 0, nk)
        return nxt_ph, nxt_pq, nxt_ps, nxt_pk, ctr + 1

    @pl.when((heads_blk_idx + q_blk_idx == 0) & (num_seqs > 0))
    def _init_ring():
        prod = (jnp.int32(0),) * 5
        for _ in range(num_bufs):
            prod = prod_advance(prod)
        state_ref[0] = 0   # consumer resume seq
        state_ref[1] = 0   # consumer tile counter
        for i in range(5):
            state_ref[2 + i] = prod[i]

    init_seq_idx = state_ref[0]

    def store_row_masks(store_lo, store_hi):
        """Shared row-validity masks for the l/m ([q_rows, 128]) and acc
        ([q_blk, group, head_dim]) scratch stores. Row i of l/m belongs
        to token i//group, rewritten i >= group*bound (no int div)."""
        i_lm = lax.broadcasted_iota(jnp.int32, (q_blk_size * group, 128), 0)
        lm_mask = (i_lm >= store_lo * group) & (i_lm < store_hi * group)
        i_acc = lax.broadcasted_iota(
            jnp.int32, (q_blk_size, group, head_dim), 0)
        acc_mask = (i_acc >= store_lo) & (i_acc < store_hi)
        return lm_mask, acc_mask

    def flash_tile(q_scaled, k, v, head_l, head_m, head_acc, *, masks,
                   visibility, init, single=None):
        """One online-softmax update for one kv head.

        q_scaled: [q_rows, head_dim] (pre-multiplied by scale);
        k, v: [cols, head_dim]; visibility(shape) -> bool[q_rows, cols]
        (True = visible); `init` traced bool: initialize the running
        stats instead of merging; `masks`: (lm_mask, acc_mask) from
        store_row_masks. `single` (traced bool or None): this tile is the
        sequence's ONLY kv tile for this q block — take a direct-softmax
        path that skips the l/m scratch stores and the alpha/beta merge
        entirely (the dominant serving prefill shape: a whole prompt in
        one KV tile; ~40% of the tile's VPU passes are merge bookkeeping).
        """
        lm_mask, acc_mask = masks
        qk = jnp.einsum("nd,md->nm", q_scaled, k,
                        preferred_element_type=jnp.float32)
        if soft_cap > 0.0:
            qk = soft_cap * jnp.tanh(qk / soft_cap)
        # Select (not add): garbage K rows (clamped pages, past-kv cols)
        # may produce NaN/inf scores; select replaces them outright.
        qk = jnp.where(visibility(qk.shape), qk, MASK_VALUE)

        def with_init(ref, val):
            return jnp.where(init, jnp.full_like(ref, val), ref[...])

        m_curr = jnp.max(qk, axis=1, keepdims=True)
        s_curr = jnp.exp(qk - m_curr)
        # PV on the MXU in the KV dtype (fp32 probs x bf16 V would force a
        # 4-8x slower fp32 matmul); probs are in [0,1] so bf16 rounding is
        # the standard flash-attention tradeoff. Accumulation stays fp32.
        sv = jnp.dot(s_curr.astype(v.dtype) if v.dtype == jnp.bfloat16
                     else s_curr, v, preferred_element_type=jnp.float32)
        l_curr = s_curr.sum(axis=1, keepdims=True)

        def tile_cols(arr, shape):
            # arr columns are all identical (keepdims reductions broadcast
            # into the 128-lane scratch); widen by no-op concat or narrow
            # by slicing to match head_dim.
            if arr.shape == shape:
                return arr
            if shape[1] >= arr.shape[1]:
                return jnp.concatenate([arr] * (shape[1] // arr.shape[1]),
                                       axis=1)
            return arr[:, :shape[1]]

        def merge_path():
            lm_shape = head_m.shape
            m_curr_b = jnp.broadcast_to(m_curr, lm_shape)
            l_curr_b = jnp.broadcast_to(l_curr, lm_shape)
            m_prev = with_init(head_m, -jnp.inf)
            l_prev = with_init(head_l, 0.0)
            m_next = jnp.maximum(m_prev, m_curr_b)
            alpha = jnp.exp(m_prev - m_next)
            beta = jnp.exp(m_curr_b - m_next)
            l_alpha = alpha * l_prev
            l_next = l_alpha + beta * l_curr_b
            l_safe = jnp.where(l_next == 0.0, 1.0, l_next)
            pltpu.store(head_m, m_next, mask=lm_mask)
            pltpu.store(head_l, l_safe, mask=lm_mask)

            o_prev = with_init(head_acc, 0.0).reshape(-1, head_dim)
            out = lax.div(
                tile_cols(l_alpha, sv.shape) * o_prev
                + tile_cols(beta, sv.shape) * sv,
                tile_cols(l_safe, sv.shape),
            )
            pltpu.store(head_acc, out.reshape(head_acc.shape),
                        mask=acc_mask)

        if single is None:
            merge_path()
            return

        @pl.when(single)
        def _direct():
            l_safe = jnp.where(l_curr == 0.0, 1.0, l_curr)
            out = lax.div(sv, tile_cols(l_safe, sv.shape))
            pltpu.store(head_acc, out.reshape(head_acc.shape),
                        mask=acc_mask)

        @pl.when(~single)
        def _merge():
            merge_path()

    def q_head_slice(kv_head):
        """[q_rows, head_dim] pre-scaled q rows for one kv head.

        Scale is premultiplied here ([rows, 128] pass) instead of on qk
        ([rows, kv_cols] pass — 4x the elements at 512-token tiles); a
        misaligned head-group slice upcasts to fp32 for the relayout and
        returns to the input dtype for the MXU matmul.
        """
        q_head0 = kv_head * group
        q = q_ref[:, q_head0:q_head0 + group, :]
        if q.shape[1] % _dtype_packing(q.dtype) != 0:
            q = q.astype(jnp.float32)
        q = q.reshape(-1, head_dim)
        return (q.astype(jnp.float32) * scale).astype(q_ref.dtype)

    def q_blk_pending(state):
        done, seq_idx, _ = state
        in_range = (q_len_start < cu_q_lens_ref[num_seqs]) \
            & (seq_idx < num_seqs)
        return (done == 0) & in_range

    def process_seq(state):
        done, seq_idx, cons_ctr = state
        q_start, q_end, q_len, kv_len, _, _ = seq_q_span(seq_idx)
        eff_kv_len = eff_kv_len_of(seq_idx)
        prompt_len = prompt_lens_ref[seq_idx]
        store_lo = jnp.maximum(q_start - q_len_start, 0)
        store_hi = jnp.minimum(q_end - q_len_start, q_blk_size)
        masks = store_row_masks(store_lo, store_hi)
        # Scaled-iota visibility constants. Token of row i (global
        # within the q block) = i // group; absolute position
        # row_pos = base + i // group.
        base = kv_len - q_len + row_offset + q_len_start - q_start
        if tri_enabled:
            # TriangleMix row rule: row is a "middle" prefill row iff
            # prompt_len - row_pos >= last (implies row_pos < prompt_len
            # for last >= 1); i//g <= prompt_len-last-base <=> i < g*(..+1).
            tri_scalar = tri_on & (prompt_len > dense_threshold)
            trirow_bound = lax.select(
                tri_scalar, (prompt_len - last - base + 1) * group,
                _I32_MIN)

        def kv_pending(kv_state):
            kv_blk, _ = kv_state
            return kv_blk * kv_blk_size < eff_kv_len

        def process_kv_blk(kv_state):
            kv_blk, cons_ctr = kv_state
            kv_buf = start_copy(heads_blk_idx, seq_idx, kv_blk,
                                lax.rem(cons_ctr, num_bufs)).wait()
            kv_pos_start = kv_blk * kv_blk_size

            def visibility(shape):
                """bool[q_rows, cols]: causal AND in-kv-range AND
                TriangleMix-visible, via scaled-iota compares only."""
                j = lax.broadcasted_iota(jnp.int32, shape, 1)
                if merge_new_kv:
                    # Fused decode: one query per seq at position
                    # kv_len (row_offset past the cache), so every
                    # cached column is causal-visible and decode rows
                    # are always TriangleMix-dense — in-range (and the
                    # sliding window, when on) are the live predicates.
                    vis = j < (kv_len - kv_pos_start)
                    if attn_window > 0:
                        vis &= j >= (kv_len - kv_pos_start
                                     - (attn_window - 1))
                    return vis
                i = lax.broadcasted_iota(jnp.int32, shape, 0)
                # causal: row_pos >= col_pos <=> i >= g*(j + c)
                causal_rhs = (j + (kv_pos_start - base)) * group
                visible = i >= causal_rhs
                # in-range: col_pos < kv_len
                visible &= j < (kv_len - kv_pos_start)
                if attn_window > 0:
                    # sliding window: row_pos - col_pos < attn_window
                    # <=> i < g*(j + c + attn_window)
                    visible &= i < causal_rhs + group * attn_window
                if tri_enabled:
                    # TriangleMix invisible: middle row & col past sink &
                    # outside window. window: row_pos - col_pos > window
                    # <=> i >= causal_rhs + g*(window+1).
                    tri_inv = ((i < trirow_bound)
                               & (j > (sink - kv_pos_start))
                               & (i >= causal_rhs + group * (window + 1)))
                    visible &= ~tri_inv
                return visible

            kv_flat = kv_buf.reshape(
                kv_pages_blk * page_size * combined_blk, head_dim)
            # Only-tile detection: first AND last kv block for this
            # (seq, q block) => direct softmax, no merge bookkeeping.
            # Fused decode always merges (the new-KV diagonal tile
            # follows), so the fast path is compiled out there.
            single = (None if (merge_new_kv or has_sinks) else
                      (kv_blk == 0) & ((kv_blk + 1) * kv_blk_size
                                       >= eff_kv_len))
            packing = _dtype_packing(kv_flat.dtype)
            load_step = max(1, packing // 2)
            # The visibility mask and the V column-validity mask are
            # per-(q block, kv tile) — hoist them out of the kv-head loop
            # (they were the largest VPU cost in the tile, paid once per
            # head otherwise).
            vis_rows = q_blk_size * group
            vis_mask = visibility((vis_rows, kv_blk_size))
            col_valid = (lax.broadcasted_iota(
                jnp.int32, (kv_blk_size, head_dim), 0)
                < (kv_len - kv_pos_start))
            zeros_v = None
            for h0 in range(0, kv_heads_blk, load_step):
                k_list, v_list = _split_kv_heads(kv_flat, h0, combined_blk,
                                                 load_step)
                for s in range(load_step):
                    k, v = k_list[s], v_list[s]
                    if k_scale is not None:
                        k = (k.astype(jnp.float32) * k_scale).astype(
                            q_ref.dtype)
                    if v_scale is not None:
                        v = (v.astype(jnp.float32) * v_scale).astype(
                            q_ref.dtype)
                    # Rows from skipped (never-DMA'd) pages hold stale VMEM
                    # bits; 0-probability * NaN would still poison sv, so
                    # zero V past the context (K garbage is handled by the
                    # visibility select on qk).
                    if zeros_v is None:
                        zeros_v = jnp.zeros_like(v)
                    v = jnp.where(col_valid, v, zeros_v)
                    kv_head = h0 + s
                    q_head0 = kv_head * group
                    flash_tile(
                        q_head_slice(kv_head), k, v,
                        l_ref.at[kv_head],
                        m_ref.at[kv_head],
                        acc_ref.at[:, q_head0:q_head0 + group, :],
                        masks=masks,
                        visibility=lambda shape: vis_mask,
                        init=kv_blk == 0,
                        single=single)
            # Ring refill: the tile just consumed freed one slot; issue
            # the producer's next fetch into it. The compute reads above
            # are program-ordered before this DMA start (same
            # write-after-read argument as classic double buffering,
            # num_bufs deep).
            prod = tuple(state_ref[2 + i] for i in range(5))
            prod = prod_advance(prod)
            for i in range(5):
                state_ref[2 + i] = prod[i]
            return next_kv_blk(kv_blk, seq_idx), cons_ctr + 1

        _, cons_ctr = lax.while_loop(kv_pending, process_kv_blk,
                                     (0, cons_ctr))
        nxt_seq = lax.select(q_end <= q_len_end, seq_idx + 1, seq_idx)
        done = lax.select(q_end < q_len_end, done, 1)
        return done, nxt_seq, cons_ctr

    _, seq_idx, cons_ctr = lax.while_loop(
        q_blk_pending, process_seq, (0, init_seq_idx, state_ref[1]))
    state_ref[0] = lax.select(seq_idx < num_seqs, seq_idx, 0)
    state_ref[1] = cons_ctr

    if merge_new_kv:
        # Fused decode: one extra online-softmax tile whose columns are
        # THIS q block's own tokens' fresh K/V (still unwritten to the
        # cache). Row i sees exactly column i//group (its own token):
        # g*j <= i < g*j + g. All rows merge in one shot after the seq
        # loop; rows of never-iterated pad seqs produce garbage that is
        # never read.
        full_masks = store_row_masks(0, q_blk_size)
        num_valid_cols = cu_q_lens_ref[num_seqs] - q_len_start

        def diag_visibility(shape):
            i = lax.broadcasted_iota(jnp.int32, shape, 0)
            j = lax.broadcasted_iota(jnp.int32, shape, 1)
            return (i >= j * group) & (i < j * group + group)

        for kv_head in range(kv_heads_blk):
            k_col = new_ref[:, 2 * kv_head, :]
            v_col = new_ref[:, 2 * kv_head + 1, :]
            # Zero V rows past the real tokens: block padding may read
            # NaN/garbage, and 0-probability * NaN still poisons sv.
            col_valid = (lax.broadcasted_iota(jnp.int32, v_col.shape, 0)
                         < num_valid_cols)
            v_col = jnp.where(col_valid, v_col.astype(jnp.float32),
                              0.0).astype(v_col.dtype)
            if k_scale is not None:
                k_col = (k_col.astype(jnp.float32) * k_scale).astype(
                    q_ref.dtype)
            if v_scale is not None:
                v_col = (v_col.astype(jnp.float32) * v_scale).astype(
                    q_ref.dtype)
            q_head0 = kv_head * group
            flash_tile(
                q_head_slice(kv_head), k_col, v_col,
                l_ref.at[kv_head],
                m_ref.at[kv_head],
                acc_ref.at[:, q_head0:q_head0 + group, :],
                masks=full_masks,
                visibility=diag_visibility,
                init=False)

    if has_sinks:
        # Sink correction: softmax-with-extra-sink-column == plain softmax
        # output scaled by l / (l + exp(sink_logit - m)) per row. l/m live
        # in scratch (the merge path always stores them when has_sinks).
        rows = q_blk_size * group
        row_head = lax.rem(
            lax.broadcasted_iota(jnp.int32, (rows, 128), 0), group)
        head0 = heads_blk_idx * q_heads_blk
        for kv_head in range(kv_heads_blk):
            s = jnp.zeros((rows, 128), jnp.float32)
            for g in range(group):
                s = jnp.where(row_head == g,
                              sinks_ref[head0 + kv_head * group + g], s)
            l = l_ref[kv_head]
            factor = l / (l + jnp.exp(s - m_ref[kv_head]))
            if head_dim != 128:
                factor = jnp.concatenate([factor] * (head_dim // 128),
                                         axis=1)
            q_head0 = kv_head * group
            head_acc = acc_ref[:, q_head0:q_head0 + group, :]
            acc_ref[:, q_head0:q_head0 + group, :] = (
                head_acc.reshape(rows, head_dim) * factor
            ).reshape(head_acc.shape)

    o_ref[...] = acc_ref[...].astype(q_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("scale", "sink", "window", "last", "dense_threshold",
                     "soft_cap", "k_scale", "v_scale", "attn_window",
                     "tri_enabled",
                     "num_kv_pages_per_block", "num_queries_per_block",
                     "vmem_limit_bytes", "interpret", "row_offset"))
def ragged_paged_attention_pallas(
    q: jax.Array,            # [T, num_q_heads, head_dim]
    kv_cache: jax.Array,     # [num_pages, page, 2*KH interleaved, head_dim]
    md: AttentionMetadata,
    use_triangle=False,      # python bool or traced bool (scanned layer flag)
    new_kv: jax.Array | None = None,  # [T, 2*KH, head_dim] fused-decode
                                      # current-token K/V (interleaved)
    *,
    scale: float,
    sink: int = 4,
    window: int = 32,
    last: int = 64,
    dense_threshold: int = 2048,
    soft_cap: float = 0.0,
    k_scale: float | None = None,
    v_scale: float | None = None,
    attn_window: int = 0,
    tri_enabled: bool = True,
    sinks: jax.Array | None = None,  # f32[num_q_heads] learned sink logits
    num_kv_pages_per_block: int | None = None,
    num_queries_per_block: int | None = None,
    vmem_limit_bytes: int | None = None,
    interpret: bool = False,
    row_offset: int = 0,
):
    T, num_q_heads, head_dim = q.shape
    _, page_size, combined_heads, _ = kv_cache.shape
    num_kv_heads = combined_heads // 2
    R, pages_per_seq = md.block_tables.shape
    group = num_q_heads // num_kv_heads
    merge_new_kv = new_kv is not None

    q_heads_blk, combined_blk = select_head_block(
        num_q_heads, combined_heads, q.dtype, kv_cache.dtype)
    kv_pages_blk, q_blk_size = default_block_sizes(page_size, T,
                                                   pages_per_seq,
                                                   q_heads_blk,
                                                   combined_blk)
    if num_kv_pages_per_block is not None:
        kv_pages_blk = num_kv_pages_per_block
    if num_queries_per_block is not None:
        q_blk_size = num_queries_per_block

    num_heads_blks = num_q_heads // q_heads_blk
    num_q_blks = pl.cdiv(T, q_blk_size)
    grid = (num_heads_blks, num_q_blks)

    # DMA-ring depth: deep enough to hide the ~13 us HBM->VMEM round trip
    # behind multiple tiles' compute, capped by a VMEM budget.
    tile_bytes = (kv_pages_blk * page_size * combined_blk * head_dim
                  * kv_cache.dtype.itemsize)
    num_bufs = max(2, min(6, (8 * 1024 * 1024) // max(tile_bytes, 1)))

    def q_index_map(heads_blk, q_blk, *_):
        return (q_blk, heads_blk, 0)

    q_spec = pl.BlockSpec((q_blk_size, q_heads_blk, head_dim), q_index_map)
    in_specs = [q_spec, pl.BlockSpec(memory_space=pl.ANY)]
    inputs = [q, kv_cache]
    if merge_new_kv:
        in_specs.append(pl.BlockSpec(
            (q_blk_size, combined_blk, head_dim), q_index_map))
        inputs.append(new_kv)
    kernel = pl.pallas_call(
        functools.partial(
            _kernel,
            scale=scale, sink=sink, window=window, last=last,
            dense_threshold=dense_threshold, soft_cap=soft_cap,
            k_scale=k_scale, v_scale=v_scale,
            row_offset=row_offset, merge_new_kv=merge_new_kv,
            attn_window=attn_window, tri_enabled=tri_enabled,
            has_sinks=sinks is not None),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=6 + (1 if sinks is not None else 0),
            in_specs=in_specs,
            out_specs=q_spec,
            grid=grid,
            scratch_shapes=[
                pltpu.SMEM((8,), jnp.int32),
                pltpu.VMEM((num_bufs, kv_pages_blk, page_size,
                            combined_blk, head_dim), kv_cache.dtype),
                pltpu.SemaphoreType.DMA((num_bufs,)),
                pltpu.VMEM((combined_blk // 2, q_blk_size * group, 128),
                           jnp.float32),
                pltpu.VMEM((combined_blk // 2, q_blk_size * group, 128),
                           jnp.float32),
                pltpu.VMEM((q_blk_size, q_heads_blk, head_dim),
                           jnp.float32),
            ],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            # Physical VMEM is 128 MiB on v5e/v6e; the compiler's default
            # scoped-vmem budget is only 16 MiB and large KV tiles + the
            # mask/softmax stack temporaries overflow it. 100 MiB matches
            # what production TPU ragged-attention kernels request.
            vmem_limit_bytes=vmem_limit_bytes or 100 * 1024 * 1024,
        ),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        name="vtt_ragged_paged_attention",
        interpret=interpret,
    )
    tri_flag = jnp.asarray(use_triangle, jnp.int32).reshape(1)
    num_seqs = jnp.asarray(md.num_reqs, jnp.int32).reshape(1)
    scalars = [
        md.seq_lens.astype(jnp.int32),
        md.block_tables.astype(jnp.int32),
        md.query_start_loc.astype(jnp.int32),
        md.prompt_lens.astype(jnp.int32),
        tri_flag,
        num_seqs,
    ]
    if sinks is not None:
        scalars.append(sinks.astype(jnp.float32))
    return kernel(*scalars, *inputs)
