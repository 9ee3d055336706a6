"""Decode-specialized paged attention kernel vs the XLA-native reference.

The fused-decode contract: one query per sequence (row i = seq i),
md.seq_lens EXCLUDES the current token, and the current token's K/V are
passed raw (`new_kv`) instead of being written to the cache first. The
reference semantics are write-then-attend over kv_len + 1
(attention/backend.py: the VTT_DISABLE_PALLAS branch of
fused_decode_attention).
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
from vllm_trianglemix_tpu.ops.decode_attention import (
    decode_paged_attention_pallas,
)

PAGE = 16


def build_decode_batch(kv_lens, *, num_live=None, num_kv_heads=2,
                       num_q_heads=12, head_dim=128, max_blocks=None,
                       dtype=jnp.float32, seed=0):
    """kv_lens: cached context length per sequence (current token NOT
    included). Returns (q, new_kv, cache, md, ref_out_fn_inputs)."""
    rng = np.random.default_rng(seed)
    R = len(kv_lens)
    num_live = R if num_live is None else num_live
    max_blocks = max_blocks or max(-(-(kv + 1) // PAGE) for kv in kv_lens)
    num_pages = R * max_blocks + 1

    q = rng.standard_normal((R, num_q_heads, head_dim), np.float32)
    k_new = rng.standard_normal((R, num_kv_heads, head_dim), np.float32)
    v_new = rng.standard_normal((R, num_kv_heads, head_dim), np.float32)
    cache = jnp.zeros(kv_cache_shape(num_pages, PAGE, num_kv_heads,
                                     head_dim), dtype)

    block_tables = np.zeros((R, max_blocks), np.int32)
    slot_mapping = np.zeros(R, np.int32)
    hist_k, hist_v, hist_slots = [], [], []
    for r, kv_len in enumerate(kv_lens):
        bt = 1 + np.arange(r * max_blocks, (r + 1) * max_blocks,
                           dtype=np.int32)
        block_tables[r] = bt
        pos = np.arange(kv_len, dtype=np.int32)
        slots = bt[pos // PAGE] * PAGE + pos % PAGE
        hist_k.append(rng.standard_normal(
            (kv_len, num_kv_heads, head_dim), np.float32))
        hist_v.append(rng.standard_normal(
            (kv_len, num_kv_heads, head_dim), np.float32))
        hist_slots.append(slots)
        slot_mapping[r] = bt[kv_len // PAGE] * PAGE + kv_len % PAGE

    cache = write_to_kv_cache(cache,
                              jnp.asarray(np.concatenate(hist_k)),
                              jnp.asarray(np.concatenate(hist_v)),
                              jnp.asarray(np.concatenate(hist_slots)))
    md = AttentionMetadata(
        positions=jnp.asarray(np.asarray(kv_lens, np.int32)),
        req_idx=jnp.arange(R, dtype=jnp.int32),
        slot_mapping=jnp.asarray(slot_mapping),
        block_tables=jnp.asarray(block_tables),
        seq_lens=jnp.asarray(np.asarray(kv_lens, np.int32)),
        prompt_lens=jnp.asarray(np.asarray(kv_lens, np.int32)),
        query_start_loc=jnp.arange(R + 1, dtype=jnp.int32),
        logits_indices=jnp.arange(R, dtype=jnp.int32),
        num_reqs=jnp.asarray(num_live, jnp.int32),
    )
    return (jnp.asarray(q).astype(dtype),
            jnp.asarray(k_new).astype(dtype),
            jnp.asarray(v_new).astype(dtype),
            cache, md)


def run_both(kv_lens, *, num_live=None, num_kv_heads=2, num_q_heads=12,
             head_dim=128, dtype=jnp.float32, soft_cap=0.0, attn_window=0,
             **kernel_kwargs):
    q, k_new, v_new, cache, md = build_decode_batch(
        kv_lens, num_live=num_live, num_kv_heads=num_kv_heads,
        num_q_heads=num_q_heads, head_dim=head_dim, dtype=dtype)
    scale = head_dim ** -0.5
    R = q.shape[0]
    num_live = R if num_live is None else num_live

    # Reference: write the current token, attend over kv_len + 1.
    cache_ref = write_to_kv_cache(cache, k_new, v_new, md.slot_mapping)
    md_inc = md._replace(seq_lens=md.seq_lens + 1)
    ref = ragged_paged_attention_xla(q, cache_ref, md_inc, False,
                                     scale=scale, soft_cap=soft_cap,
                                     attn_window=attn_window)

    new_kv = jnp.stack([k_new, v_new], axis=2).reshape(
        R, 2 * num_kv_heads, head_dim)
    got = decode_paged_attention_pallas(
        q, cache, md, new_kv, scale=scale, soft_cap=soft_cap,
        attn_window=attn_window, interpret=True, **kernel_kwargs)

    tol = 2e-2 if dtype == jnp.bfloat16 else 2e-5
    np.testing.assert_allclose(
        np.asarray(got[:num_live], np.float32),
        np.asarray(ref[:num_live], np.float32), atol=tol, rtol=tol)


def test_single_seq():
    run_both([33])


def test_batch_varied_contexts():
    run_both([33, 17, 50, 1, 100])


def test_page_boundary_contexts():
    # kv_len exactly at / one under / one over a page boundary.
    run_both([16, 15, 17, 32, 31])


def test_gqa_group_sizes():
    run_both([40, 9], num_q_heads=16, num_kv_heads=4)


def test_mha_no_group():
    run_both([25, 12], num_q_heads=4, num_kv_heads=4)


def test_soft_cap():
    run_both([36, 21], soft_cap=30.0)


def test_multiple_kv_tiles():
    # Tiles smaller than the context force the online-softmax chain.
    run_both([70, 90, 33], num_kv_pages_per_block=2)


def test_padded_batch_rows_ignored():
    # Rows past num_reqs are padding: garbage in, never read.
    run_both([33, 17, 1, 1, 1], num_live=2)


def test_bfloat16_packed_kv():
    run_both([48, 30, 7], dtype=jnp.bfloat16)


def test_sliding_window():
    run_both([80, 100, 12], attn_window=40)


def test_sliding_window_multi_tile_skips_lead_in():
    run_both([120, 90], attn_window=33, num_kv_pages_per_block=2)


def test_int8_kv_cache_dequant():
    # int8 cache with k/v scales; the new token stays raw (exact), the
    # reference quantizes it on write — compare loosely.
    from vllm_trianglemix_tpu.attention.backend import quantize_kv

    q, k_new, v_new, cache, md = build_decode_batch(
        [33, 17], dtype=jnp.float32)
    scale = 128 ** -0.5
    k_s, v_s = 0.05, 0.05
    cache_q = jnp.zeros(cache.shape, jnp.int8)
    # Re-quantize the float cache contents into int8.
    cache_q = (cache.astype(jnp.float32) / k_s).round().clip(
        -127, 127).astype(jnp.int8)
    new_kv = jnp.stack([k_new, v_new], axis=2).reshape(2, 4, 128)
    got = decode_paged_attention_pallas(
        q, cache_q, md, new_kv, scale=scale, k_scale=k_s, v_scale=v_s,
        interpret=True)
    # Reference: dequantized float cache + raw new token via the XLA path
    # (write the raw new token into the DEQUANTIZED cache).
    cache_deq = (cache_q.astype(jnp.float32) * k_s)
    cache_ref = write_to_kv_cache(cache_deq, k_new, v_new, md.slot_mapping)
    md_inc = md._replace(seq_lens=md.seq_lens + 1)
    ref = ragged_paged_attention_xla(q, cache_ref, md_inc, False,
                                     scale=scale)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref, np.float32),
                               atol=2e-2, rtol=2e-2)
