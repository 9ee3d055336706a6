#!/usr/bin/env python
"""Decode-shape attention-kernel tile sweep (fused-decode path).

32 seqs x 1 token, ~520-token contexts (the bench's decode shape), 28
back-to-back kernel launches per iteration to mimic one decode step's
per-layer cost. Sweeps (kv pages/tile, q rows/block).

Run on TPU:  python scripts/profile_decode_attn.py
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
    R, ctx = 32, 520
    HQ, KH, Dh = 12, 2, 128
    page = int(os.environ.get("PAGE", "128"))
    L = 28
    pages_per_seq = -(-1024 // page)
    num_pages = R * pages_per_seq + 1
    key = jax.random.PRNGKey(0)

    q = jax.random.normal(key, (R, HQ, Dh), jnp.bfloat16)
    kv = jax.random.normal(key, (num_pages, page, 2 * KH, Dh), jnp.bfloat16)
    new_kv = jax.random.normal(key, (R, 2 * KH, Dh), jnp.bfloat16)

    qsl = np.arange(R + 1, dtype=np.int32)
    bt = (1 + np.arange(R * pages_per_seq).reshape(R, pages_per_seq)) \
        .astype(np.int32)
    md = AttentionMetadata(
        positions=None, req_idx=None, slot_mapping=None,
        block_tables=jnp.asarray(bt),
        seq_lens=jnp.full(R, ctx, jnp.int32),
        prompt_lens=jnp.full(R, 500, jnp.int32),
        query_start_loc=jnp.asarray(qsl),
        logits_indices=None,
        num_reqs=jnp.asarray(R, jnp.int32),
    )

    @jax.jit
    def layers(q, kv, new_kv, md):
        def body(h, _):
            o = ragged_paged_attention_pallas(
                h, kv, md, False, new_kv, scale=Dh ** -0.5, row_offset=1)
            return o, None
        out, _ = jax.lax.scan(body, q, None, length=L)
        return out

    def bench(kv_pages, q_blk, iters=6):
        @jax.jit
        def run(q, kv, new_kv, md):
            def body(h, _):
                o = ragged_paged_attention_pallas(
                    h, kv, md, False, new_kv, scale=Dh ** -0.5,
                    row_offset=1, num_kv_pages_per_block=kv_pages,
                    num_queries_per_block=q_blk)
                return o, None
            out, _ = jax.lax.scan(body, q, None, length=L)
            return out

        try:
            times = []
            for i in range(iters):
                qi = q * (1.0 + i * 1e-3)
                t0 = time.perf_counter()
                out = run(qi, kv, new_kv, md)
                float(np.asarray(jax.device_get(out[0, 0, 0])))
                times.append(time.perf_counter() - t0)
            return min(times[1:])
        except Exception as e:  # noqa: BLE001
            print(f"  kv_pages={kv_pages} q_blk={q_blk}: "
                  f"{type(e).__name__}: {str(e)[:100]}")
            return None

    print(f"decode shape: R={R} ctx={ctx} page={page} L={L}")
    for kv_pages, q_blk in [(4, 8), (8, 8), (4, 16), (8, 16), (2, 8),
                            (8, 32), (4, 32)]:
        if kv_pages > pages_per_seq:
            continue
        t = bench(kv_pages, q_blk)
        if t is not None:
            print(f"  kv_pages={kv_pages} ({kv_pages*page:4d} tok) "
                  f"q_blk={q_blk:3d}: {t*1e3:7.2f} ms/step-of-{L}-layers",
                  flush=True)


if __name__ == "__main__":
    main()
