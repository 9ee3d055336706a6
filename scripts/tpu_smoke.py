#!/usr/bin/env python
"""Compiled-on-TPU validation of the in-repo Pallas kernels vs XLA refs.

Interpret-mode coverage lives in tests/attention/; this script exercises
the Mosaic-compiled bodies (dynamic-length DMA, packed bf16 K/V split) on
the real chip. Run manually or before benches.
"""

import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from tests.attention.test_pallas_kernel import build_batch  # noqa: E402
from vllm_trianglemix_tpu.attention.backend import (  # noqa: E402
    kv_cache_shape,
    ragged_paged_attention_xla,
    write_to_kv_cache,
)
from vllm_trianglemix_tpu.ops.kv_cache_update import (  # noqa: E402
    build_kv_update_slices,
    kv_cache_update_pallas,
)
from vllm_trianglemix_tpu.ops.ragged_paged_attention import (  # noqa: E402
    ragged_paged_attention_pallas,
)


def check_attention():
    seqs = [(256, 256, 256), (1, 64, 63), (32, 80, 80), (1, 500, 499)]
    q, cache, md = build_batch(seqs, num_kv_heads=8, num_q_heads=16,
                               head_dim=128, max_blocks=32,
                               dtype=jnp.bfloat16)
    common = dict(scale=128 ** -0.5, sink=4, window=32, last=64,
                  dense_threshold=128)
    got = np.asarray(ragged_paged_attention_pallas(q, cache, md, True,
                                                   **common))
    ref = np.asarray(ragged_paged_attention_xla(q, cache, md, True,
                                                **common))
    T = int(md.query_start_loc[-1])
    err = np.abs(got[:T].astype(np.float32) - ref[:T].astype(np.float32)).max()
    assert err < 3e-2, f"attention err {err}"
    print("ragged_paged_attention (triangle, bf16): OK, max err", err)


def check_kv_update():
    rng = np.random.default_rng(0)
    PAGE, KH, D, T = 16, 8, 128, 100
    slots = np.concatenate([
        np.arange(32, 32 + 40), [-1], [400], np.arange(210, 210 + 30),
        np.arange(700, 700 + 28)]).astype(np.int32)
    k = rng.standard_normal((len(slots), KH, D)).astype(np.float32)
    v = rng.standard_normal((len(slots), KH, D)).astype(np.float32)
    cache0 = jnp.asarray(
        rng.standard_normal(kv_cache_shape(64, PAGE, KH, D)), jnp.bfloat16)
    ref = write_to_kv_cache(cache0, jnp.asarray(k, jnp.bfloat16),
                            jnp.asarray(v, jnp.bfloat16),
                            jnp.asarray(slots))
    slices, n = build_kv_update_slices(slots, PAGE, 24)
    kv = jnp.stack([jnp.asarray(k, jnp.bfloat16),
                    jnp.asarray(v, jnp.bfloat16)],
                   axis=2).reshape(len(slots), 2 * KH, D)
    got = kv_cache_update_pallas(kv, cache0, jnp.asarray(slices),
                                 jnp.asarray(n, jnp.int32))
    np.testing.assert_array_equal(np.asarray(got, np.float32),
                                  np.asarray(ref, np.float32))
    print("kv_cache_update (dynamic-length DMA, bf16): OK")


def check_quantized_kv_attention():
    from tests.attention.test_kv_cache_quant import quantized_batch

    for cache_dtype, scale in ((jnp.float8_e4m3fn, 0.25),
                               (jnp.int8, 4.0 / 127)):
        q, cache, md = quantized_batch(cache_dtype, scale)
        q = q.astype(jnp.bfloat16)
        common = dict(scale=128 ** -0.5, sink=4, window=32, last=64,
                      dense_threshold=2048, k_scale=scale, v_scale=scale)
        got = np.asarray(ragged_paged_attention_pallas(q, cache, md, False,
                                                       **common))
        ref = np.asarray(ragged_paged_attention_xla(q, cache, md, False,
                                                    **common))
        T = int(md.query_start_loc[-1])
        err = np.abs(got[:T].astype(np.float32)
                     - ref[:T].astype(np.float32)).max()
        assert err < 5e-2, (cache_dtype, err)
        print(f"quantized KV attention ({cache_dtype.__name__}): OK,",
              "max err", err)


if __name__ == "__main__":
    assert jax.default_backend() == "tpu", jax.default_backend()
    check_attention()
    check_kv_update()
    check_quantized_kv_attention()
    print("TPU smoke: all OK")
