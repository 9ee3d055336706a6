#!/usr/bin/env python
"""Ablate the prefill step to locate the MFU gap.

Times the jitted step fn at the bench's prefill shape (T tokens, R reqs)
with components monkeypatched out: attention kernel, KV write, and an
all-matmul-only variant. Also times the raw fused QKV+MLP matmul chain on
identical shapes for the roofline comparison.

Run on TPU:  python scripts/profile_prefill_ablate.py [T] [R]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from bench import MODEL_CONFIG  # noqa: E402


def main() -> None:
    T = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    R = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    import jax
    import jax.numpy as jnp

    import vllm_trianglemix_tpu.models.decoder as dec
    from vllm_trianglemix_tpu.attention.metadata import AttentionMetadata
    from vllm_trianglemix_tpu.entrypoints.llm import LLM
    from vllm_trianglemix_tpu.ops.kv_cache_update import (
        build_kv_update_slices,
    )

    with tempfile.TemporaryDirectory() as d:
        with open(os.path.join(d, "config.json"), "w") as f:
            json.dump(MODEL_CONFIG, f)
        llm = LLM(model=d, skip_tokenizer_init=True, dtype="bfloat16",
                  max_model_len=1024, max_num_seqs=R,
                  max_num_batched_tokens=T, block_size=128,
                  multi_step_decode=1, load_format="dummy")
        runner = llm.llm_engine.engine_core.executor.worker.model_runner

        page = runner.block_size
        per_req = T // R
        pages_per_seq = -(-per_req // page)

        # Build a realistic ragged prefill batch: R seqs, per_req tokens.
        token_ids = np.random.randint(1, 50000, T).astype(np.int32)
        positions = np.tile(np.arange(per_req, dtype=np.int32), R)
        req_idx = np.repeat(np.arange(R, dtype=np.int32), per_req)
        bt = np.zeros((R, runner.max_blocks_per_req), np.int32)
        bt[:, :pages_per_seq] = np.arange(R * pages_per_seq).reshape(
            R, pages_per_seq)
        slot = bt[req_idx, positions // page] * page + positions % page
        n_slices_padded = runner._padded_num_slices(T, R)
        kv_slices, num_slices = build_kv_update_slices(
            slot.astype(np.int32), page, n_slices_padded)
        S = runner._sample_rows_per_req()
        md = AttentionMetadata(
            positions=jnp.asarray(positions),
            req_idx=jnp.asarray(req_idx),
            slot_mapping=jnp.asarray(slot.astype(np.int32)),
            block_tables=jnp.asarray(bt),
            seq_lens=jnp.full(R, per_req, jnp.int32),
            prompt_lens=jnp.full(R, per_req, jnp.int32),
            query_start_loc=jnp.asarray(
                np.arange(R + 1, dtype=np.int32) * per_req),
            logits_indices=jnp.asarray(
                np.arange(R * S, dtype=np.int32) * (per_req // S)),
            num_reqs=jnp.asarray(R, jnp.int32),
            kv_slices=jnp.asarray(kv_slices),
            num_kv_slices=jnp.asarray(num_slices, jnp.int32),
        )
        toks_dev = jnp.asarray(token_ids)

        real_attn = dec.ragged_paged_attention
        real_write = dec.write_kv

        def fake_attn(q, kv, md_, tri, **kw):
            return q * 0.9999

        def fake_write(kv, k, v, md_, kv_quant=None):
            return kv

        def run(label, attn, write, iters=6):
            dec.ragged_paged_attention = attn
            dec.write_kv = write
            fn = runner._build_step_fn()
            times = []
            for _ in range(iters):
                t0 = time.perf_counter()
                runner.kv_caches, logits, _, _h, _f = fn(
                    runner.params, runner.kv_caches, toks_dev, md,
                    runner.tri_flags, None)
                import numpy as _np
                float(_np.asarray(jax.device_get(logits[0, 0])))
                times.append(time.perf_counter() - t0)
            t = min(times[1:])
            print(f"{label:28s} {t*1e3:8.1f} ms/step")
            return t

        t_full = run("full", real_attn, real_write)
        t_noattn = run("no attention", fake_attn, real_write)
        t_nowrite = run("no kv write", real_attn, fake_write)
        t_neither = run("neither", fake_attn, fake_write)
        dec.ragged_paged_attention = real_attn
        dec.write_kv = real_write

        # Roofline: the backbone's matmuls alone at the same shapes.
        c = runner.cfg
        D, HQ, KH, Dh, I = (c.hidden_size, c.num_attention_heads,
                            c.num_key_value_heads, c.head_dim,
                            c.intermediate_size)
        L = c.num_hidden_layers
        key = jax.random.PRNGKey(0)
        x = jax.random.normal(key, (T, D), jnp.bfloat16)
        wq = jax.random.normal(key, (L, D, (HQ + 2 * KH) * Dh), jnp.bfloat16)
        wo = jax.random.normal(key, (L, HQ * Dh, D), jnp.bfloat16)
        wgu = jax.random.normal(key, (L, D, 2 * I), jnp.bfloat16)
        wd = jax.random.normal(key, (L, I, D), jnp.bfloat16)

        @jax.jit
        def matmuls_only(x, wq, wo, wgu, wd):
            def body(h, ws):
                q, o, gu, dn = ws
                a = h @ q
                h = h + a[:, :HQ * Dh] @ o
                m = h @ gu
                h = h + (m[:, :I] * m[:, I:]) @ dn
                return h, None
            h, _ = jax.lax.scan(body, x, (wq, wo, wgu, wd))
            return h

        times = []
        for _ in range(6):
            t0 = time.perf_counter()
            r = matmuls_only(x, wq, wo, wgu, wd)
            float(np.asarray(jax.device_get(r[0, 0])))
            times.append(time.perf_counter() - t0)
        t_mm = min(times[1:])
        flops = 2 * T * L * (D * (HQ + 2 * KH) * Dh + HQ * Dh * D
                             + 2 * D * I + I * D)
        print(f"{'raw fused matmul chain':28s} {t_mm*1e3:8.1f} ms/step "
              f"({flops / t_mm / 1e12:.0f} TFLOP/s)")
        print(f"attention cost   ~ {(t_full - t_noattn)*1e3:6.1f} ms")
        print(f"kv-write cost    ~ {(t_full - t_nowrite)*1e3:6.1f} ms")
        print(f"backbone residual~ {t_neither*1e3:6.1f} ms "
              f"(matmul roofline {t_mm*1e3:.1f} ms -> "
              f"{t_mm / t_neither * 100:.0f}% of residual is matmul)")
        print(f"backbone MFU ~ {flops / t_neither / 1e12:.0f} TFLOP/s of "
              f"~197 peak (v5e)")


if __name__ == "__main__":
    main()
