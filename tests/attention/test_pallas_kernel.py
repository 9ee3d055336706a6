"""Pallas ragged-paged-attention kernel vs the XLA-native reference.

Runs the kernel in interpret mode on CPU (reference test strategy for TPU
kernels, SURVEY.md §4) over ragged mixed prefill/decode batches, with and
without TriangleMix.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vllm_trianglemix_tpu.attention.backend import (
    kv_cache_shape,
    ragged_paged_attention_xla,
    write_to_kv_cache,
)
from vllm_trianglemix_tpu.attention.metadata import AttentionMetadata
from vllm_trianglemix_tpu.ops.ragged_paged_attention import (
    ragged_paged_attention_pallas,
)

PAGE = 16


def build_batch(seq_descrs, *, num_kv_heads, num_q_heads, head_dim,
                max_blocks, dtype, seed=0):
    """seq_descrs: list of (q_len, kv_len, prompt_len). Returns (q, cache,
    md). KV rows [0, kv_len) are filled with random values via the paged
    scatter; queries are the LAST q_len tokens of each sequence."""
    rng = np.random.default_rng(seed)
    R = len(seq_descrs)
    T = sum(d[0] for d in seq_descrs)
    num_pages = R * max_blocks

    q = rng.standard_normal((T, num_q_heads, head_dim), np.float32)
    cache = jnp.zeros(kv_cache_shape(num_pages, PAGE, num_kv_heads,
                                     head_dim), dtype)

    positions = np.zeros(T, np.int32)
    req_idx = np.zeros(T, np.int32)
    slot_mapping = np.full(T, -1, np.int32)
    block_tables = np.zeros((R, max_blocks), np.int32)
    seq_lens = np.zeros(R, np.int32)
    prompt_lens = np.zeros(R, np.int32)
    qsl = np.zeros(R + 1, np.int32)
    logits_indices = np.zeros(R, np.int32)

    # Scatter the full kv history for each sequence via write_to_kv_cache.
    hist_k, hist_v, hist_slots = [], [], []
    off = 0
    for r, (q_len, kv_len, prompt_len) in enumerate(seq_descrs):
        bt = np.arange(r * max_blocks, (r + 1) * max_blocks, dtype=np.int32)
        block_tables[r] = bt
        pos = np.arange(kv_len, dtype=np.int32)
        slots = bt[pos // PAGE] * PAGE + pos % PAGE
        hist_k.append(rng.standard_normal((kv_len, num_kv_heads, head_dim),
                                          np.float32))
        hist_v.append(rng.standard_normal((kv_len, num_kv_heads, head_dim),
                                          np.float32))
        hist_slots.append(slots)
        positions[off:off + q_len] = np.arange(kv_len - q_len, kv_len)
        req_idx[off:off + q_len] = r
        slot_mapping[off:off + q_len] = slots[kv_len - q_len:]
        seq_lens[r] = kv_len
        prompt_lens[r] = prompt_len
        qsl[r + 1] = off + q_len
        logits_indices[r] = off + q_len - 1
        off += q_len

    cache = write_to_kv_cache(cache,
                              jnp.asarray(np.concatenate(hist_k)),
                              jnp.asarray(np.concatenate(hist_v)),
                              jnp.asarray(np.concatenate(hist_slots)))
    md = AttentionMetadata(
        positions=jnp.asarray(positions),
        req_idx=jnp.asarray(req_idx),
        slot_mapping=jnp.asarray(slot_mapping),
        block_tables=jnp.asarray(block_tables),
        seq_lens=jnp.asarray(seq_lens),
        prompt_lens=jnp.asarray(prompt_lens),
        query_start_loc=jnp.asarray(qsl),
        logits_indices=jnp.asarray(logits_indices),
        num_reqs=jnp.asarray(R, jnp.int32),
    )
    return jnp.asarray(q).astype(dtype), cache, md


def run_both(seq_descrs, *, use_triangle=False, dense_threshold=2048,
             num_q_heads=8, num_kv_heads=4, head_dim=128, dtype=jnp.float32,
             soft_cap=0.0, attn_window=0, with_sinks=False, **kernel_kwargs):
    max_blocks = max(-(-kv // PAGE) for _, kv, _ in seq_descrs)
    q, cache, md = build_batch(seq_descrs, num_kv_heads=num_kv_heads,
                               num_q_heads=num_q_heads, head_dim=head_dim,
                               max_blocks=max_blocks, dtype=dtype)
    scale = head_dim ** -0.5
    common = dict(scale=scale, sink=4, window=32, last=64,
                  dense_threshold=dense_threshold, soft_cap=soft_cap,
                  attn_window=attn_window)
    if with_sinks:
        common["sinks"] = jnp.asarray(
            np.random.default_rng(7).standard_normal(num_q_heads),
            jnp.float32)
    ref = ragged_paged_attention_xla(q, cache, md, use_triangle, **common)
    got = ragged_paged_attention_pallas(q, cache, md, use_triangle,
                                        interpret=True, **common,
                                        **kernel_kwargs)
    # Only rows belonging to real requests are defined.
    T = int(md.query_start_loc[-1])
    tol = 2e-2 if dtype == jnp.bfloat16 else 2e-5
    np.testing.assert_allclose(np.asarray(got[:T], np.float32),
                               np.asarray(ref[:T], np.float32),
                               atol=tol, rtol=tol)


def test_single_prefill():
    run_both([(24, 24, 24)])


def test_chunked_prefill_tail():
    # 2nd chunk of a prefill: 16 new tokens on top of 48 cached.
    run_both([(16, 64, 64)])


def test_pure_decode_batch():
    run_both([(1, 33, 32), (1, 17, 16), (1, 50, 49)])


def test_mixed_prefill_decode():
    run_both([(1, 40, 39), (25, 25, 25), (1, 7, 6), (30, 62, 62)])


def test_gqa_group_sizes():
    run_both([(20, 52, 52), (1, 30, 29)], num_q_heads=16, num_kv_heads=4)


def test_mha_no_group():
    run_both([(12, 12, 12)], num_q_heads=4, num_kv_heads=4)


def test_soft_cap():
    run_both([(20, 36, 36), (1, 21, 20)], soft_cap=30.0)


def test_multiple_q_and_kv_blocks():
    # Force tiny blocks so the seq spans several q and kv blocks.
    run_both([(70, 70, 70), (1, 90, 89)],
             num_queries_per_block=16, num_kv_pages_per_block=2)


def test_triangle_exact_small_threshold():
    # dense_threshold=0 engages triangle masking for every prefill row.
    run_both([(120, 120, 120)], use_triangle=True, dense_threshold=0,
             num_queries_per_block=16, num_kv_pages_per_block=2)


def test_triangle_block_skip_long_prefill():
    # Long prompt: middle kv blocks are skipped; exactness vs XLA ref.
    run_both([(200, 200, 200)], use_triangle=True, dense_threshold=64,
             num_queries_per_block=32, num_kv_pages_per_block=2)


def test_triangle_mixed_batch_and_decode_stays_dense():
    run_both([(150, 150, 150), (1, 80, 70), (40, 100, 100)],
             use_triangle=True, dense_threshold=64,
             num_queries_per_block=32, num_kv_pages_per_block=2)


def test_triangle_off_below_threshold():
    run_both([(100, 100, 100)], use_triangle=True, dense_threshold=2048)


def test_bfloat16_packed_kv():
    run_both([(32, 48, 48), (1, 30, 29)], dtype=jnp.bfloat16)


def test_traced_triangle_flag():
    # The layer scan passes use_triangle as a traced bool.
    run_both([(100, 100, 100)], use_triangle=jnp.asarray(True),
             dense_threshold=64, num_queries_per_block=32,
             num_kv_pages_per_block=2)


# --- sliding-window attention (Mistral semantics) ---------------------------

def dense_swa_reference(q, cache, md, *, scale, attn_window):
    """Brute-force windowed-causal attention for validation of BOTH paths."""
    import numpy as np

    T = int(md.query_start_loc[-1])
    num_blocks, page, twoKH, D = cache.shape
    KH = twoKH // 2
    HQ = q.shape[1]
    G = HQ // KH
    out = np.zeros((T, HQ, D), np.float32)
    cache_np = np.asarray(cache, np.float32)
    for t in range(T):
        r = int(md.req_idx[t])
        pos = int(md.positions[t])
        ctx = int(md.seq_lens[r])
        bt = np.asarray(md.block_tables[r])
        cols = [c for c in range(ctx)
                if c <= pos and (pos - c) < attn_window]
        k = np.stack([cache_np[bt[c // page], c % page, 0::2] for c in cols])
        v = np.stack([cache_np[bt[c // page], c % page, 1::2] for c in cols])
        for h in range(HQ):
            kh = h // G
            s = np.asarray(q[t, h], np.float32) @ k[:, kh].T * scale
            p = np.exp(s - s.max())
            p /= p.sum()
            out[t, h] = p @ v[:, kh]
    return out


def test_sliding_window_matches_dense_reference():
    seqs = [(24, 96, 96), (1, 80, 79)]
    max_blocks = max(-(-kv // PAGE) for _, kv, _ in seqs)
    q, cache, md = build_batch(seqs, num_kv_heads=4, num_q_heads=8,
                               head_dim=128, max_blocks=max_blocks,
                               dtype=jnp.float32)
    scale = 128 ** -0.5
    W = 40
    ref = dense_swa_reference(q, cache, md, scale=scale, attn_window=W)
    xla = ragged_paged_attention_xla(q, cache, md, False, scale=scale,
                                     attn_window=W)
    T = ref.shape[0]
    np.testing.assert_allclose(np.asarray(xla[:T], np.float32), ref,
                               atol=2e-5, rtol=2e-5)


def test_sliding_window_pallas_vs_xla():
    run_both([(24, 96, 96), (1, 80, 79), (16, 48, 48)], attn_window=40)


def test_sliding_window_block_skip_long_context():
    # Context much longer than the window: lead-in kv blocks are skipped.
    run_both([(8, 200, 200), (1, 180, 179)], attn_window=33,
             num_queries_per_block=8, num_kv_pages_per_block=2)


def test_sliding_window_with_gqa_bf16():
    run_both([(20, 100, 100), (1, 90, 89)], attn_window=25,
             num_q_heads=16, num_kv_heads=4, dtype=jnp.bfloat16)


def test_attention_sinks_single_prefill():
    run_both([(24, 24, 24)], with_sinks=True)


def test_attention_sinks_mixed_batch():
    run_both([(1, 40, 8), (17, 33, 33), (1, 70, 9)], with_sinks=True)


def test_attention_sinks_multi_kv_block():
    run_both([(100, 260, 260)], with_sinks=True)


def test_attention_sinks_with_window_gqa_bf16():
    run_both([(48, 120, 120), (1, 90, 10)], with_sinks=True,
             attn_window=64, dtype=jnp.bfloat16)
