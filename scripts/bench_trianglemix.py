#!/usr/bin/env python
"""TriangleMix attention speedup on TPU: dense vs triangle prefill.

Measures the isolated ragged-paged-attention kernel on one long prefill
at several sequence lengths. The reference claims ~4x attention-compute
reduction at seq 4096 (TRIANGLEMIX_QUICK_REFERENCE.md:268-276) but never
wired the mask into attention; here the middle KV blocks are actually
skipped (no DMA, no FLOPs).
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from tests.attention.test_pallas_kernel import build_batch  # noqa: E402
from vllm_trianglemix_tpu.ops.ragged_paged_attention import (  # noqa: E402
    ragged_paged_attention_pallas,
)

PAGE = 16


def bench_one(seq_len: int, use_triangle: bool, iters: int = 10) -> float:
    q, cache, md = build_batch(
        [(seq_len, seq_len, seq_len)], num_kv_heads=8, num_q_heads=32,
        head_dim=128, max_blocks=seq_len // PAGE, dtype=jnp.bfloat16)
    kwargs = dict(scale=128 ** -0.5, sink=4, window=32, last=64,
                  dense_threshold=2048)

    def run(i):
        # vary the input so no layer of the stack can cache the result,
        # and force a value fetch so async dispatch can't hide execution
        out = ragged_paged_attention_pallas(q + i * 1e-6, cache, md,
                                            use_triangle, **kwargs)
        return float(out[0, 0, 0])

    run(0)  # compile
    t0 = time.perf_counter()
    for i in range(1, iters + 1):
        run(i)
    return (time.perf_counter() - t0) / iters


def main() -> None:
    assert jax.default_backend() == "tpu"
    print(f"{'seq':>7} {'dense_ms':>9} {'triangle_ms':>11} {'speedup':>8}")
    for seq in (4096, 8192, 16384):
        dense = bench_one(seq, False) * 1000
        tri = bench_one(seq, True) * 1000
        print(f"{seq:>7} {dense:>9.2f} {tri:>11.2f} {dense / tri:>7.2f}x")


if __name__ == "__main__":
    main()
