"""MLA Pallas latent-attention kernel vs the XLA reference numerics.

Runs the kernel in interpret mode on CPU over ragged mixed
prefill/decode batches, including the lane-padded case (real DeepSeek
width 576 -> 640): pad lanes are zero in both q and cache, contributing
nothing to the scores.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from vllm_trianglemix_tpu.attention.metadata import AttentionMetadata
from vllm_trianglemix_tpu.attention.mla import mla_paged_attention_xla
from vllm_trianglemix_tpu.ops.mla_attention import (
    mla_paged_attention_pallas,
)

PAGE = 16


def build(seq_descrs, W, seed=0):
    """seq_descrs: [(q_len, kv_len)] — q rows are the LAST q_len
    positions of each kv_len context."""
    rng = np.random.default_rng(seed)
    R = len(seq_descrs)
    max_blocks = max(-(-kv // PAGE) for _, kv in seq_descrs)
    num_pages = R * max_blocks + 2
    cache = rng.standard_normal((num_pages, PAGE, 1, W)).astype(
        np.float32) * 0.3
    T = sum(q for q, _ in seq_descrs)
    block_tables = np.zeros((R, max_blocks), np.int32)
    positions = np.zeros(T, np.int32)
    req_idx = np.zeros(T, np.int32)
    seq_lens = np.zeros(R, np.int32)
    qsl = np.zeros(R + 1, np.int32)
    off = 0
    for r, (q_len, kv_len) in enumerate(seq_descrs):
        nb = -(-kv_len // PAGE)
        block_tables[r, :nb] = 1 + r * max_blocks + np.arange(nb)
        positions[off:off + q_len] = np.arange(kv_len - q_len, kv_len)
        req_idx[off:off + q_len] = r
        seq_lens[r] = kv_len
        qsl[r + 1] = off + q_len
        off += q_len
    H = 4
    q = rng.standard_normal((T, H, W)).astype(np.float32) * 0.3
    md = AttentionMetadata(
        positions=jnp.asarray(positions), req_idx=jnp.asarray(req_idx),
        slot_mapping=None, block_tables=jnp.asarray(block_tables),
        seq_lens=jnp.asarray(seq_lens), prompt_lens=jnp.asarray(seq_lens),
        query_start_loc=jnp.asarray(qsl), logits_indices=None,
        num_reqs=jnp.asarray(R, jnp.int32),
    )
    return jnp.asarray(q), jnp.asarray(cache), md


@pytest.mark.parametrize("descrs", [
    [(1, 1)],                          # single fresh token
    [(5, 5), (1, 20), (1, 33)],        # prefill + decodes
    [(17, 40), (3, 19)],               # chunked prefill tails
    [(33, 33), (1, 64), (9, 31), (1, 1)],
])
def test_matches_xla(descrs):
    W, v_dim = 256, 128
    q, cache, md = build(descrs, W)
    ref = mla_paged_attention_xla(q, cache, md, scale=0.21, v_dim=v_dim)
    got = mla_paged_attention_pallas(q, cache, md, scale=0.21,
                                     v_dim=v_dim, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=2e-4)


def test_lane_padded_width_matches_unpadded_xla():
    # real width 192 (rank 128 + rope 64) padded to 256 for the kernel
    W_real, Wp, v_dim = 192, 256, 128
    q, cache, md = build([(9, 22), (1, 17)], W_real, seed=3)
    ref = mla_paged_attention_xla(q, cache, md, scale=0.17, v_dim=v_dim)
    qp = jnp.pad(q, ((0, 0), (0, 0), (0, Wp - W_real)))
    cp = jnp.pad(cache, ((0, 0), (0, 0), (0, 0), (0, Wp - W_real)))
    got = mla_paged_attention_pallas(qp, cp, md, scale=0.17,
                                     v_dim=v_dim, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=2e-4)


def test_q_block_boundaries():
    # q_blk forced to 8 so a 20-row seq spans multiple programs
    W, v_dim = 128, 128
    q, cache, md = build([(20, 20), (7, 30)], W, seed=5)
    ref = mla_paged_attention_xla(q, cache, md, scale=0.3, v_dim=v_dim)
    got = mla_paged_attention_pallas(
        q, cache, md, scale=0.3, v_dim=v_dim,
        num_queries_per_block=8, num_kv_pages_per_block=1,
        interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=2e-4)
