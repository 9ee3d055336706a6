"""Fused decode attention: in-kernel merged current token + deferred write.

The fused path (backend.py:fused_decode_attention) attends over the
cached context (kv_len = pos) with the Pallas kernel merging the current
token's K/V column in-kernel (the `new_kv` diagonal tile), and defers
ALL layers' cache writes to one batched launch (write_kv_all_layers).
It must be numerically identical to the pre-fusion decode path: write
this token's K/V, then attend with kv_len = pos + 1.
"""

import jax
import jax.numpy as jnp
import numpy as np

from tests.attention.test_pallas_kernel import PAGE, build_batch
from vllm_trianglemix_tpu.attention.backend import (
    ragged_paged_attention_xla,
    write_kv_all_layers,
    write_to_kv_cache,
)
from vllm_trianglemix_tpu.ops.ragged_paged_attention import (
    ragged_paged_attention_pallas,
)


def run_fused_vs_reference(seq_descrs, *, num_q_heads=8, num_kv_heads=4,
                           head_dim=128, use_triangle=False,
                           dense_threshold=2048, attn_window=0):
    """seq_descrs: (1, kv_len, prompt_len) rows — pure decode. The batch
    builder fills kv rows [0, kv_len); we treat position kv_len as the
    NEW token whose K/V stays in registers for the fused path."""
    max_blocks = max(-(-(kv + 1) // PAGE) for _, kv, _ in seq_descrs)
    q, cache, md = build_batch(seq_descrs, num_kv_heads=num_kv_heads,
                               num_q_heads=num_q_heads, head_dim=head_dim,
                               max_blocks=max_blocks, dtype=jnp.float32)
    R = len(seq_descrs)
    rng = np.random.default_rng(7)
    k_new = jnp.asarray(rng.standard_normal((R, num_kv_heads, head_dim)),
                        jnp.float32)
    v_new = jnp.asarray(rng.standard_normal((R, num_kv_heads, head_dim)),
                        jnp.float32)
    scale = head_dim ** -0.5
    common = dict(scale=scale, sink=4, window=32, last=64,
                  dense_threshold=dense_threshold, attn_window=attn_window)

    # The new token sits at position kv_len (one past the built history).
    pos_new = md.seq_lens  # [R]
    slot_new = (md.block_tables[jnp.arange(R), pos_new // PAGE] * PAGE
                + pos_new % PAGE)

    # Reference: write the new token, attend with kv_len = pos + 1.
    cache_ref = write_to_kv_cache(cache, k_new, v_new, slot_new)
    md_ref = md._replace(seq_lens=md.seq_lens + 1, positions=pos_new,
                         slot_mapping=slot_new)
    ref = ragged_paged_attention_xla(q, cache_ref, md_ref, use_triangle,
                                     **common)

    # Fused: kernel over the un-written cache with the new K/V merged
    # in-kernel as the diagonal tile.
    md_fused = md._replace(positions=pos_new, slot_mapping=slot_new)
    new_kv = jnp.stack([k_new, v_new], axis=2).reshape(
        R, 2 * num_kv_heads, head_dim)
    got = ragged_paged_attention_pallas(
        q, cache, md_fused, use_triangle, new_kv, row_offset=1,
        interpret=True, **common)

    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_fused_decode_batch():
    run_fused_vs_reference([(1, 33, 32), (1, 17, 16), (1, 50, 49)])


def test_fused_decode_gqa():
    run_fused_vs_reference([(1, 40, 39), (1, 7, 6)], num_q_heads=16,
                           num_kv_heads=2)


def test_fused_decode_first_token_after_prompt():
    # pos == prompt_len exactly (first decode step).
    run_fused_vs_reference([(1, 16, 16), (1, 31, 31)])


def test_fused_decode_triangle_layers_stay_dense():
    # Decode rows are dense even on triangle layers; the offset must not
    # push them into the prefill-row triangle mask.
    run_fused_vs_reference([(1, 40, 39), (1, 25, 24)], use_triangle=True,
                           dense_threshold=8)


def test_write_kv_all_layers_matches_per_layer():
    L, pages, KH, D, T = 3, 6, 2, 128, 5
    rng = np.random.default_rng(3)
    caches = jnp.asarray(rng.standard_normal((L, pages, PAGE, 2 * KH, D)),
                         jnp.float32)
    ks = jnp.asarray(rng.standard_normal((L, T, KH, D)), jnp.float32)
    vs = jnp.asarray(rng.standard_normal((L, T, KH, D)), jnp.float32)
    slots = jnp.asarray([3, 17, 40, 95, 2], jnp.int32)
    lengths = jnp.asarray([1, 1, 0, 1, 1], jnp.int32)  # row 2 inactive

    got = write_kv_all_layers(caches, ks, vs, slots, lengths)

    expect = []
    slot_masked = jnp.where(lengths > 0, slots, -1)
    for layer in range(L):
        expect.append(write_to_kv_cache(caches[layer], ks[layer],
                                        vs[layer], slot_masked))
    np.testing.assert_allclose(np.asarray(got), np.asarray(jnp.stack(expect)))


def test_fused_decode_sliding_window():
    # Decode with context past the window: cached columns outside the
    # window are invisible; the merged current token is always visible.
    run_fused_vs_reference([(1, 70, 69), (1, 33, 32), (1, 10, 9)],
                           attn_window=24)
