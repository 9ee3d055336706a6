#!/usr/bin/env python
"""Standalone Pallas attention-kernel timing at the bench prefill shape.

Sweeps (num_kv_pages_per_block, num_queries_per_block). Measured truth
(v5e, single-dispatch slope method): the default (4, 128) runs
~0.66 ms/layer (~18.5 ms across the 28-layer step); (2, 256) and
(2, 128) are ~1.0 ms — the (512-col, 128-row) default stands. The
per-element floor is ~0.13 ms (matmul) + ~0.45 ms of VPU softmax
passes, so the kernel sits near its VPU-bound roofline; further gains
need structurally fewer live columns (intra-tile causal pruning), not
tile-size tuning.

Run on TPU:  python scripts/profile_attn_kernel.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from vllm_trianglemix_tpu.attention.metadata import AttentionMetadata
from vllm_trianglemix_tpu.ops.ragged_paged_attention import (
    ragged_paged_attention_pallas,
)


def main() -> None:
    T, R = 8192, 16
    per_req = 500
    HQ, KH, Dh = 12, 2, 128
    page = 128
    num_pages = 257
    pages_per_seq = 8
    key = jax.random.PRNGKey(0)

    q = jax.random.normal(key, (T, HQ, Dh), jnp.bfloat16)
    kv = jax.random.normal(key, (num_pages, page, 2 * KH, Dh), jnp.bfloat16)

    # R seqs x 500 tokens = 8000 real tokens (rest padding of last seq).
    qsl = np.zeros(R + 1, np.int32)
    qsl[1:] = np.cumsum([per_req] * R)
    bt = np.zeros((R, pages_per_seq), np.int32)
    bt[:, :] = (np.arange(R * pages_per_seq).reshape(R, pages_per_seq)
                % (num_pages - 1))
    md = AttentionMetadata(
        positions=None, req_idx=None, slot_mapping=None,
        block_tables=jnp.asarray(bt),
        seq_lens=jnp.full(R, per_req, jnp.int32),
        prompt_lens=jnp.full(R, per_req, jnp.int32),
        query_start_loc=jnp.asarray(qsl),
        logits_indices=None,
        num_reqs=jnp.asarray(R, jnp.int32),
    )

    def bench(kv_pages, q_blk, L1=2, L2=30, iters=5):
        """Slope of two SINGLE-DISPATCH jitted chains (L2 - L1 kernels).

        Two traps this avoids (both produced garbage sweeps earlier):
        - jax.block_until_ready does NOT synchronize over the axon
          tunnel — a scalar fetch (float(out[0,0,0])) is the only
          reliable barrier (see .claude/skills/verify gotchas);
        - Python-level chained dispatch measures the tunnel's per-call
          dispatch rate, not device time — the chain must live inside
          ONE jit so the device runs back-to-back kernels.
        Inputs vary per iteration to dodge any result cache.
        """
        def make(L):
            @jax.jit
            def chain(x):
                for _ in range(L):
                    x = ragged_paged_attention_pallas(
                        x, kv, md, False, scale=Dh ** -0.5,
                        num_kv_pages_per_block=kv_pages,
                        num_queries_per_block=q_blk)
                return x
            return chain

        try:
            def run(c):
                times = []
                for it in range(iters):
                    x = q * (1.0 + 0.001 * it)
                    t0 = time.perf_counter()
                    out = c(x)
                    _ = float(out[0, 0, 0])
                    times.append(time.perf_counter() - t0)
                return min(times[1:])

            return (run(make(L2)) - run(make(L1))) / (L2 - L1)
        except Exception as e:
            print(f"  kv_pages={kv_pages} q_blk={q_blk}: "
                  f"{type(e).__name__}: {str(e)[:120]}")
            return None

    print(f"workload: T={T} R={R} per_req={per_req} "
          f"HQ={HQ} KH={KH} page={page}")
    import itertools
    cfgs = [(4,128),(4,256),(2,128),(8,128),(4,512),(2,256)]
    for kv_pages, q_blk in cfgs:
        t = bench(kv_pages, q_blk)
        if t is not None:
            print(f"  kv_pages={kv_pages} q_blk={q_blk:4d}: "
                  f"{t * 1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
