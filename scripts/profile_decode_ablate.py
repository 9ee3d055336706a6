#!/usr/bin/env python
"""Ablate multi-step decode components to locate per-step overhead.

Monkeypatches the decoder's attention / KV-write calls with cheap
stand-ins and re-times the K-step decode dispatch. The deltas attribute
per-step cost to: paged-attention kernel, KV-update kernel, lm_head+
sampling, and the residual (weight streaming + XLA glue).

Run on TPU:  python scripts/profile_decode_ablate.py [K]
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

    import vllm_trianglemix_tpu.models.decoder as dec
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
        smd = build_sampling_metadata(
            [SamplingParams(temperature=0.0) for _ in range(R)],
            list(range(R)), R)
        bt = np.zeros((R, runner.max_blocks_per_req), np.int32)
        bt[:, :pages_per_seq] = np.arange(R * pages_per_seq).reshape(
            R, pages_per_seq)
        bt_dev = jnp.asarray(bt)
        key = jax.random.PRNGKey(0)

        real_attn = dec.ragged_paged_attention
        real_write = dec.write_kv

        def fake_attn(q, kv, md, tri, **kw):
            return q * 0.9999

        def fake_write(kv, k, v, md, kv_quant=None):
            return kv

        def run(label, attn, write, iters=5):
            nonlocal key
            dec.ragged_paged_attention = attn
            dec.write_kv = write
            fn = runner._build_multi_decode_fn()
            times = []
            for it in range(iters):
                key, sub = jax.random.split(key)
                toks = jax.random.randint(sub, (R,), 0,
                                          MODEL_CONFIG["vocab_size"],
                                          dtype=jnp.int32)
                t0 = time.perf_counter()
                runner.kv_caches, sampled = fn(
                    runner.params, runner.kv_caches, toks,
                    jnp.full(R, 500, jnp.int32), jnp.full(R, K, jnp.int32),
                    bt_dev, jnp.full(R, 500, jnp.int32), smd,
                    runner.tri_flags, sub, jnp.asarray(R, jnp.int32), None,
                    K, True)
                float(np.asarray(jax.device_get(sampled))[0, 0])
                times.append(time.perf_counter() - t0)
            t = min(times[1:])
            print(f"{label:28s} {t*1e3:8.1f} ms/dispatch "
                  f"{t/K*1e3:7.2f} ms/step")
            return t

        t_full = run("full", real_attn, real_write)
        t_noattn = run("no attention", fake_attn, real_write)
        t_nowrite = run("no kv write", real_attn, fake_write)
        t_neither = run("neither", fake_attn, fake_write)
        dec.ragged_paged_attention = real_attn
        dec.write_kv = real_write

        print(f"attention cost   ~ {(t_full-t_noattn)/K*1e3:6.2f} ms/step")
        print(f"kv-write cost    ~ {(t_full-t_nowrite)/K*1e3:6.2f} ms/step")
        print(f"backbone residual~ {t_neither/K*1e3:6.2f} ms/step "
              f"(weights+lm_head+sampling+glue)")


if __name__ == "__main__":
    main()
