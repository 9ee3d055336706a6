#!/usr/bin/env python
"""Decode-specialized attention kernel: per-layer cost vs DMA ring depth.

Bench decode shape: 32 seqs x 1 token, ~520-token contexts. Chains L
kernel launches through a scan (output feeds next input) so the tunnel
cannot dedupe/reorder, and differences two scan lengths to cancel the
host<->device fetch RTT.

Run on TPU:  python scripts/profile_decode_kernel.py
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
from vllm_trianglemix_tpu.ops.decode_attention import (
    decode_paged_attention_pallas,
)

L1, L2 = 28, 168


def main() -> None:
    R, ctx = 32, 520
    HQ, KH, Dh = 12, 2, 128
    page = int(os.environ.get("PAGE", "128"))
    pages_per_seq = -(-1024 // page)
    num_pages = R * pages_per_seq + 1
    key = jax.random.PRNGKey(0)

    q = jax.random.normal(key, (R, HQ, Dh), jnp.bfloat16)
    kv = jax.random.normal(key, (num_pages, page, 2 * KH, Dh), jnp.bfloat16)
    new_kv = jax.random.normal(key, (R, 2 * KH, Dh), jnp.bfloat16)

    bt = (1 + np.arange(R * pages_per_seq).reshape(R, pages_per_seq)) \
        .astype(np.int32)
    md = AttentionMetadata(
        positions=None, req_idx=None, slot_mapping=None,
        block_tables=jnp.asarray(bt),
        seq_lens=jnp.full(R, ctx, jnp.int32),
        prompt_lens=jnp.full(R, 500, jnp.int32),
        query_start_loc=jnp.asarray(np.arange(R + 1, dtype=np.int32)),
        logits_indices=None,
        num_reqs=jnp.asarray(R, jnp.int32),
    )

    def make(length, num_bufs, kvpb):
        @jax.jit
        def run(q, kv, new_kv, md):
            def body(h, _):
                o = decode_paged_attention_pallas(
                    h, kv, md, new_kv, scale=Dh ** -0.5,
                    num_bufs=num_bufs,
                    num_kv_pages_per_block=kvpb)
                return o, None
            out, _ = jax.lax.scan(body, q, None, length=length)
            return out
        return run

    kvpb_list = [None if x == "none" else int(x) for x in
                 os.environ.get("KVPB", "none").split(",")]
    nbufs_list = [int(x) for x in os.environ.get("NBUFS", "2,4,8").split(",")]
    for kvpb in kvpb_list:
        for num_bufs in nbufs_list:
            r1 = make(L1, num_bufs, kvpb)
            r2 = make(L2, num_bufs, kvpb)
            # warm compile
            float(r1(q, kv, new_kv, md)[0, 0, 0])
            float(r2(q, kv, new_kv, md)[0, 0, 0])
            t1s, t2s = [], []
            for i in range(5):
                qi = q * (1.0 + i * 1e-3)
                t0 = time.perf_counter()
                float(r1(qi, kv, new_kv, md)[0, 0, 0])
                t1s.append(time.perf_counter() - t0)
                t0 = time.perf_counter()
                float(r2(qi, kv, new_kv, md)[0, 0, 0])
                t2s.append(time.perf_counter() - t0)
            t1, t2 = min(t1s), min(t2s)
            per_layer = (t2 - t1) / (L2 - L1)
            print(f"kvpb={kvpb} num_bufs={num_bufs}: per-layer "
                  f"{per_layer*1e6:8.1f} us "
                  f"(L{L1} {t1*1e3:.2f} ms, L{L2} {t2*1e3:.2f} ms)")


if __name__ == "__main__":
    main()
