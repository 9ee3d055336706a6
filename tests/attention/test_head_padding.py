"""Lane-padded head storage (reference pallas.py:17-18 head padding).

On TPU the KV cache stores heads padded to the 128-lane boundary so the
Pallas kernels serve head_dim 64/96/... models; the dispatch pads Q /
new-K/V in and slices outputs back. These tests force a padded cache on
CPU and pin the padded paths to the unpadded ground truth.
"""

import jax.numpy as jnp
import numpy as np

from vllm_trianglemix_tpu.attention.backend import (
    fused_decode_attention,
    ragged_paged_attention,
    ragged_paged_attention_xla,
    write_to_kv_cache,
)
from tests.attention.test_pallas_kernel import PAGE, build_batch


def _pad_cache(cache, d_pad):
    b, p, h, d = cache.shape
    out = jnp.zeros((b, p, h, d_pad), cache.dtype)
    return out.at[..., :d].set(cache)


def test_padded_cache_prefill_matches_unpadded():
    descrs = [(7, 12, 12), (1, 20, 9), (5, 5, 5)]
    q, cache, md = build_batch(descrs, num_kv_heads=2, num_q_heads=4,
                               head_dim=64, max_blocks=3,
                               dtype=jnp.float32)
    ref = ragged_paged_attention_xla(jnp.asarray(q), cache, md,
                                     scale=64 ** -0.5, tri_enabled=False)
    padded = _pad_cache(cache, 128)
    got = ragged_paged_attention(jnp.asarray(q), padded, md,
                                 scale=64 ** -0.5, tri_enabled=False)
    assert got.shape == ref.shape  # sliced back to true head_dim
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_padded_write_only_touches_true_columns():
    cache = jnp.zeros((4, PAGE, 4, 128), jnp.float32)
    k = jnp.ones((3, 2, 64), jnp.float32)
    v = 2 * jnp.ones((3, 2, 64), jnp.float32)
    slots = jnp.asarray([0, 1, PAGE + 2], jnp.int32)
    out = write_to_kv_cache(cache, k, v, slots)
    assert float(out[0, 0, 0, 0]) == 1.0    # k row
    assert float(out[0, 0, 1, 0]) == 2.0    # v row
    assert float(jnp.abs(out[..., 64:]).max()) == 0.0  # pad stays zero


def test_padded_fused_decode_matches_unpadded():
    # one decode token per request over existing context
    descrs = [(1, 9, 9), (1, 17, 17)]
    q, cache, md = build_batch(descrs, num_kv_heads=2, num_q_heads=4,
                               head_dim=64, max_blocks=3,
                               dtype=jnp.float32, seed=3)
    rng = np.random.default_rng(4)
    k_new = rng.standard_normal((2, 2, 64)).astype(np.float32)
    v_new = rng.standard_normal((2, 2, 64)).astype(np.float32)
    # fused contract: seq_lens excludes the current token
    md_f = md._replace(seq_lens=md.seq_lens - 1,
                       positions=md.seq_lens - 1,
                       slot_mapping=md.slot_mapping[-2:])
    q1 = jnp.asarray(q[-2:])

    ref = fused_decode_attention(q1, jnp.asarray(k_new),
                                 jnp.asarray(v_new), cache, md_f,
                                 scale=64 ** -0.5, tri_enabled=False)
    got = fused_decode_attention(q1, jnp.asarray(k_new),
                                 jnp.asarray(v_new),
                                 _pad_cache(cache, 128), md_f,
                                 scale=64 ** -0.5, tri_enabled=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
