#!/usr/bin/env python
"""Decompose the multi-step decode dispatch cost on the real chip.

Times the runner's actual ``_jit_multi_decode`` (K steps fused in one
dispatch) at the headline-bench decode shape (R=32, ctx ~550) and at
ctx ~1 (attention nearly free). The difference isolates the paged-
attention share; the remainder is weight streaming + lm_head + sampling.
Prints per-token-step milliseconds against the HBM-bandwidth floor.

Run on TPU:  python scripts/profile_decode.py [K]
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
    K = int(sys.argv[1]) if len(sys.argv) > 1 else 50

    import jax
    import jax.numpy as jnp

    from vllm_trianglemix_tpu.entrypoints.llm import LLM
    from vllm_trianglemix_tpu.sample.metadata import build_sampling_metadata
    from vllm_trianglemix_tpu.sampling_params import SamplingParams

    with tempfile.TemporaryDirectory() as d:
        with open(os.path.join(d, "config.json"), "w") as f:
            json.dump(MODEL_CONFIG, f)
        llm = LLM(model=d, skip_tokenizer_init=True, dtype="bfloat16",
                  max_model_len=1024, max_num_seqs=32,
                  max_num_batched_tokens=8192, block_size=128,
                  multi_step_decode=K, load_format="dummy")
        runner = llm.llm_engine.engine_core.executor.worker.model_runner

        R = 32
        page = runner.block_size
        pages_per_seq = 1024 // page
        params = runner.params
        smd = build_sampling_metadata(
            [SamplingParams(temperature=0.0) for _ in range(R)],
            list(range(R)), R)

        bt = np.arange(R * pages_per_seq, dtype=np.int32).reshape(
            R, pages_per_seq)
        block_tables = np.zeros((R, runner.max_blocks_per_req), np.int32)
        block_tables[:, :pages_per_seq] = bt
        key = jax.random.PRNGKey(0)

        def run(ctx: int, iters: int = 6) -> float:
            nonlocal key
            base = jnp.full(R, ctx, jnp.int32)
            steps = jnp.full(R, K, jnp.int32)
            times = []
            for it in range(iters):
                key, sub = jax.random.split(key)
                toks = jax.random.randint(sub, (R,), 0,
                                          MODEL_CONFIG["vocab_size"],
                                          dtype=jnp.int32)
                t0 = time.perf_counter()
                runner.kv_caches, sampled = runner._jit_multi_decode(
                    params, runner.kv_caches, toks, base, steps,
                    jnp.asarray(block_tables),
                    jnp.full(R, ctx, jnp.int32), smd, runner.tri_flags,
                    sub, jnp.asarray(R, jnp.int32), None, K, True)
                float(np.asarray(jax.device_get(sampled))[0, 0])
                times.append(time.perf_counter() - t0)
            return min(times[1:])  # drop compile

        t_long = run(500)
        t_short = run(1)

        cfg = MODEL_CONFIG
        L, D, I = (cfg["num_hidden_layers"], cfg["hidden_size"],
                   cfg["intermediate_size"])
        HQ, KH, Dh = (cfg["num_attention_heads"],
                      cfg["num_key_value_heads"], cfg["head_dim"])
        V = cfg["vocab_size"]
        weight_bytes = 2 * (L * (D * (HQ + 2 * KH) * Dh + HQ * Dh * D
                                 + 3 * D * I) + V * D)
        kv_bytes = R * 550 * L * 2 * KH * Dh * 2
        hbm = 819e9  # v5e ~819 GB/s
        floor_ms = (weight_bytes + kv_bytes) / hbm * 1e3

        print(f"K={K} R={R}")
        print(f"per-dispatch  ctx=500: {t_long*1e3:8.1f} ms   "
              f"ctx=1: {t_short*1e3:8.1f} ms")
        print(f"per-token-step ctx=500: {t_long/K*1e3:7.2f} ms   "
              f"ctx=1: {t_short/K*1e3:7.2f} ms")
        print(f"attention share ~= {(t_long-t_short)/K*1e3:.2f} ms/step")
        print(f"HBM floor (weights {weight_bytes/1e9:.2f} GB + "
              f"kv {kv_bytes/1e9:.2f} GB @819GB/s): {floor_ms:.2f} ms/step")


if __name__ == "__main__":
    main()
