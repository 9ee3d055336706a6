"""Pallas KV-cache update kernel vs the XLA scatter (interpret mode)."""

import jax.numpy as jnp
import numpy as np

from vllm_trianglemix_tpu.attention.backend import (
    kv_cache_shape,
    write_to_kv_cache,
)
from vllm_trianglemix_tpu.ops.kv_cache_update import (
    build_kv_update_slices,
    kv_cache_update_pallas,
)

PAGE = 16


def run_case(slot_mapping, T, num_pages=8, KH=2, D=128, dtype=jnp.float32,
             padded=None):
    rng = np.random.default_rng(0)
    slot_mapping = np.asarray(slot_mapping, np.int32)
    k = rng.standard_normal((T, KH, D)).astype(np.float32)
    v = rng.standard_normal((T, KH, D)).astype(np.float32)
    cache0 = jnp.asarray(
        rng.standard_normal(kv_cache_shape(num_pages, PAGE, KH, D)), dtype)

    ref = write_to_kv_cache(cache0, jnp.asarray(k, dtype),
                            jnp.asarray(v, dtype), jnp.asarray(slot_mapping))

    padded = padded or max(8, -(-len(slot_mapping) // 8) * 8)
    slices, n = build_kv_update_slices(slot_mapping, PAGE, padded)
    kv = jnp.stack([jnp.asarray(k, dtype), jnp.asarray(v, dtype)],
                   axis=2).reshape(T, 2 * KH, D)
    got = kv_cache_update_pallas(kv, cache0, jnp.asarray(slices),
                                 jnp.asarray(n, jnp.int32), interpret=True)
    np.testing.assert_array_equal(np.asarray(got, np.float32),
                                  np.asarray(ref, np.float32))


def test_contiguous_prefill_run():
    # 40 tokens into pages 2,3,4 (crosses page boundaries).
    slots = np.arange(2 * PAGE, 2 * PAGE + 40)
    run_case(slots, 40)


def test_scattered_decode_tokens():
    # one token per request, arbitrary pages/offsets
    slots = [5, 37, 18, 96, 127]
    run_case(slots, 5)


def test_mixed_with_padding_rows():
    slots = np.concatenate([
        np.arange(16, 36),          # prefill run
        [-1, -1],                   # padding rows dropped
        [70],                       # decode token
        np.arange(90, 96),          # short run
    ])
    run_case(slots, len(slots))


def test_noncontiguous_block_table():
    # a request whose pages are non-adjacent: runs must break
    slots = np.concatenate([np.arange(48, 64), np.arange(112, 120)])
    run_case(slots, len(slots))


def test_slice_runs_never_exceed_page():
    slots = np.arange(0, 3 * PAGE)
    slices, n = build_kv_update_slices(np.asarray(slots, np.int32), PAGE, 8)
    assert n == 3
    assert (slices[2, :n] <= PAGE).all()


def test_bfloat16():
    run_case(np.arange(10, 42), 32, dtype=jnp.bfloat16)
