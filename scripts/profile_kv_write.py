#!/usr/bin/env python
"""Microbenchmark the prefill KV-write path at bench shapes.

Times (a) the Pallas slice-DMA kernel alone, (b) the full write_kv wrapper
(stack/pad/astype + kernel), (c) the XLA scatter fallback, (d) a raw
contiguous device copy of the same byte volume, per layer and x28 layers.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from vllm_trianglemix_tpu.attention.backend import write_kv, write_to_kv_cache
from vllm_trianglemix_tpu.attention.metadata import AttentionMetadata
from vllm_trianglemix_tpu.ops.kv_cache_update import (
    build_kv_update_slices, kv_cache_update_pallas)

T, R, PAGE, PAGES, KH, D = 8192, 32, 128, 257, 2, 128
L = 28


def timeit(label, fn, *args, iters=8, donate_idx=None, **kw):
    args = list(args)
    out = None
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args, **kw)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
        if donate_idx is not None:
            args[donate_idx] = out
    t = min(times[1:])
    print(f"{label:34s} {t*1e6:9.1f} us  (x{L}: {t*L*1e3:6.2f} ms)")
    return out, t


def main():
    key = jax.random.PRNGKey(0)
    k = jax.random.normal(key, (T, KH, D), jnp.bfloat16)
    v = jax.random.normal(key, (T, KH, D), jnp.bfloat16)
    cache = jnp.zeros((PAGES, PAGE, 2 * KH, D), jnp.bfloat16)
    per_req = T // R
    pages_per_seq = -(-per_req // PAGE)
    bt = np.zeros((R, 64), np.int32)
    bt[:, :pages_per_seq] = np.arange(R * pages_per_seq).reshape(R, pages_per_seq) % (PAGES - 1)
    positions = np.tile(np.arange(per_req, dtype=np.int32), R)
    req_idx = np.repeat(np.arange(R, dtype=np.int32), per_req)
    slot = bt[req_idx, positions // PAGE] * PAGE + positions % PAGE
    padded = 128
    slices_np, n = build_kv_update_slices(slot.astype(np.int32), PAGE, padded)
    print(f"num_slices={n} padded={padded}")
    slices = jnp.asarray(slices_np)
    nslices = jnp.asarray(n, jnp.int32)
    kv = jnp.concatenate([k[:, :, None, :], v[:, :, None, :]], axis=2).reshape(T, 2 * KH, D)

    md = AttentionMetadata(
        positions=jnp.asarray(positions), req_idx=jnp.asarray(req_idx),
        slot_mapping=jnp.asarray(slot.astype(np.int32)),
        block_tables=jnp.asarray(bt), seq_lens=jnp.full(R, per_req, jnp.int32),
        prompt_lens=jnp.full(R, per_req, jnp.int32),
        query_start_loc=jnp.asarray(np.arange(R + 1, dtype=np.int32) * per_req),
        logits_indices=jnp.zeros(R, jnp.int32), num_reqs=jnp.asarray(R, jnp.int32),
        kv_slices=slices, num_kv_slices=nslices)

    # (a) kernel alone, donated cache
    f_kernel = jax.jit(lambda kv_, c, s, ns: kv_cache_update_pallas(kv_, c, s, ns),
                       donate_argnums=(1,))
    cache2 = jnp.zeros_like(cache)
    def run_kernel(kv_, c, s, ns):
        return f_kernel(kv_, c, s, ns)
    cache2, _ = timeit("pallas kernel (donated)", run_kernel, kv, cache2, slices, nslices, donate_idx=1)

    # (a2) kernel alone, NOT donated
    f_kernel_nd = jax.jit(lambda kv_, c, s, ns: kv_cache_update_pallas(kv_, c, s, ns))
    _, _ = timeit("pallas kernel (no donate)", f_kernel_nd, kv, jnp.zeros_like(cache), slices, nslices)

    # (b) full write_kv wrapper (stack+pad inside), donated
    f_wkv = jax.jit(lambda c, k_, v_, m: write_kv(c, k_, v_, m), donate_argnums=(0,))
    cache3 = jnp.zeros_like(cache)
    cache3, _ = timeit("write_kv wrapper (donated)", f_wkv, cache3, k, v, md, donate_idx=0)

    # (c) XLA scatter fallback
    f_xla = jax.jit(lambda c, k_, v_, s: write_to_kv_cache(c, k_, v_, s),
                    donate_argnums=(0,))
    cache4 = jnp.zeros_like(cache)
    cache4, _ = timeit("xla scatter (donated)", f_xla, cache4, k, v,
                       jnp.asarray(slot.astype(np.int32)), donate_idx=0)

    # (d) contiguous copy of the same new-KV bytes
    f_copy = jax.jit(lambda x: x + 1)
    timeit("contig copy same bytes", f_copy, kv)

    # (e) 28-layer batched: stacked caches, vmapped kernel equivalent
    cacheL = jnp.zeros((L, PAGES, PAGE, 2 * KH, D), jnp.bfloat16)
    kvL = jnp.broadcast_to(kv, (L,) + kv.shape)
    PP = PAGES * PAGE
    def all_layers(kvl, cl, s, ns):
        # fold layer axis into page axis, offset cache starts per layer
        starts = s[0][None, :] + (jnp.arange(L, dtype=jnp.int32) * PP)[:, None]
        news = s[1][None, :] + (jnp.arange(L, dtype=jnp.int32) * T)[:, None]
        lens = jnp.broadcast_to(s[2][None, :], (L, s.shape[1]))
        valid = jnp.arange(s.shape[1])[None, :] < ns
        lens = jnp.where(valid, lens, 0)
        sl = jnp.stack([starts.reshape(-1), news.reshape(-1), lens.reshape(-1)])
        flat = cl.reshape(L * PAGES, PAGE, 2 * KH, D)
        out = kv_cache_update_pallas(kvl.reshape(L * T, 2 * KH, D), flat, sl,
                                     jnp.asarray(L * padded, jnp.int32))
        return out.reshape(cl.shape)
    f_all = jax.jit(all_layers, donate_argnums=(1,))
    cacheL, _ = timeit("all-28-layer fused kernel", f_all, kvL, cacheL, slices,
                       nslices, iters=4, donate_idx=1)


if __name__ == "__main__":
    main()
