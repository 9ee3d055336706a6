#!/usr/bin/env python
"""MLA decode-attention benchmark: Pallas latent kernel vs XLA gather
(VERDICT r4 next #7 — replace the "tunnel noise floor" claim with a real
per-layer number, and give the MLA story an end-to-end-shaped metric).

Shape: DeepSeek-V2/V3 decode — 32 requests x 500 cached latent rows,
absorbed MQA over [kv_lora_rank + rope_dim] = 576-wide rows (lane-padded
to 640), 128 query heads (V3) or 16 (V2-Lite-class), page 128.

MEASUREMENT: chains of N1/N2 kernel calls inside one lax.scan dispatch,
reporting (T(N2) - T(N1)) / (N2 - N1) — the per-dispatch ~25 ms axon
tunnel round-trip cancels (see scripts/bench_quant_gemm.py). Each
iteration's q depends on the previous output, so calls serialize on
device.

Prints ONE JSON line per variant:
  {"metric": "mla_decode_attn_us_per_layer", ...}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from vllm_trianglemix_tpu.attention.metadata import AttentionMetadata
from vllm_trianglemix_tpu.attention.mla import (
    mla_cache_shape,
    mla_paged_attention_xla,
    mla_padded_width,
)

R, CTX, PAGE = 32, 500, 128
RANK, ROPE = 512, 64           # DeepSeek kv_lora_rank + qk_rope_head_dim
W = RANK + ROPE
N1, N2 = 100, 500


def build(md_heads: int):
    wp = mla_padded_width(W)
    pages_per_seq = 8
    num_pages = R * pages_per_seq + 1
    rng = np.random.default_rng(0)
    cache = jnp.asarray(
        rng.standard_normal(mla_cache_shape(num_pages, PAGE, W)) * 0.1,
        jnp.bfloat16)
    q = jnp.asarray(rng.standard_normal((R, md_heads, wp)) * 0.1,
                    jnp.bfloat16)
    bt = rng.permutation(num_pages - 1)[: R * pages_per_seq].reshape(
        R, pages_per_seq).astype(np.int32) + 1
    kw = {f: None for f in AttentionMetadata._fields}
    kw.update(
        positions=jnp.full(R, CTX - 1, jnp.int32),
        req_idx=jnp.arange(R, dtype=jnp.int32),
        slot_mapping=jnp.full(R, -1, jnp.int32),
        block_tables=jnp.asarray(bt),
        seq_lens=jnp.full(R, CTX, jnp.int32),
        prompt_lens=jnp.full(R, CTX, jnp.int32),
        query_start_loc=jnp.arange(R + 1, dtype=jnp.int32),
        logits_indices=jnp.arange(R, dtype=jnp.int32),
        num_reqs=jnp.asarray(R, jnp.int32),
    )
    return q, cache, AttentionMetadata(**kw)


def bench(fn, q, cache, md):
    def chain(iters):
        @jax.jit
        def loop(q, cache):
            def body(c, _):
                o = fn(c, cache, md)
                fb = jnp.max(jnp.abs(o.astype(jnp.float32)))
                return c + (fb * 1e-6).astype(c.dtype), None

            c, _ = jax.lax.scan(body, q, None, length=iters)
            return c

        return loop

    def t(loop):
        float(loop(q, cache)[0, 0, 0])
        best = float("inf")
        for _ in range(4):
            t0 = time.perf_counter()
            float(loop(q, cache)[0, 0, 0])
            best = min(best, time.perf_counter() - t0)
        return best

    return (t(chain(N2)) - t(chain(N1))) / (N2 - N1)


def main():
    scale = (128 + ROPE) ** -0.5
    for heads, label in ((16, "v2-lite (16 q heads)"),
                         (128, "v3 (128 q heads)")):
        q, cache, md = build(heads)

        def xla(c, cache, md=md):
            return mla_paged_attention_xla(c, cache, md, scale=scale,
                                           v_dim=RANK)

        res = {"xla_gather": bench(xla, q, cache, md)}
        if jax.default_backend() == "tpu":
            from vllm_trianglemix_tpu.ops.mla_attention import (
                mla_paged_attention_pallas,
            )

            def kern(c, cache, md=md):
                return mla_paged_attention_pallas(c, cache, md,
                                                  scale=scale, v_dim=RANK)

            res["pallas_kernel"] = bench(kern, q, cache, md)
        for name, dt in res.items():
            print(json.dumps({
                "metric": "mla_decode_attn_us_per_layer",
                "variant": name,
                "config": label,
                "value": round(dt * 1e6, 1),
                "unit": "us",
            }))
        if "pallas_kernel" in res:
            print(f"# {label}: kernel speedup over XLA gather: "
                  f"{res['xla_gather'] / res['pallas_kernel']:.1f}x")


if __name__ == "__main__":
    main()
