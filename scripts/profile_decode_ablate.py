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
    BS = int(sys.argv[2]) if len(sys.argv) > 2 else 128

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
                  max_num_batched_tokens=8192, block_size=BS,
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

        import vllm_trianglemix_tpu.worker.model_runner as mr

        real_attn = dec.fused_decode_attention
        real_write = mr.write_kv_all_layers
        real_logits = dec.compute_logits

        def fake_attn(q, k_new, v_new, kv, md, tri, **kw):
            return q * 0.9999

        def trivial_pallas_attn(q, k_new, v_new, kv, md, tri, **kw):
            from jax.experimental import pallas as pl

            def copy_kernel(q_ref, o_ref):
                o_ref[...] = q_ref[...] * 0.9999

            return pl.pallas_call(
                copy_kernel,
                out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
            )(q)

        def fake_write(kv, ks, vs, slot, lens, kv_quant=None,
                       interpret=False):
            return kv

        def fake_logits(params, cfg, hidden):
            import jax.numpy as _jnp
            pad = cfg.vocab_size - hidden.shape[-1]
            return _jnp.pad(hidden.astype(_jnp.float32), ((0, 0), (0, pad)))

        def run(label, attn, write, logits_fn=real_logits, iters=5):
            nonlocal key
            dec.fused_decode_attention = attn
            mr.write_kv_all_layers = write
            dec.compute_logits = logits_fn
            fn = runner._build_multi_decode_fn()
            times = []
            for it in range(iters):
                key, sub = jax.random.split(key)
                toks = jax.random.randint(sub, (R,), 0,
                                          MODEL_CONFIG["vocab_size"],
                                          dtype=jnp.int32)
                t0 = time.perf_counter()
                runner.kv_caches, sampled, _last = fn(
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
        t_nologit = run("neither+no logits", fake_attn, fake_write,
                        fake_logits)
        t_trivial = run("trivial-pallas attn", trivial_pallas_attn,
                        fake_write)
        dec.fused_decode_attention = real_attn
        mr.write_kv_all_layers = real_write
        dec.compute_logits = real_logits

        print(f"attention cost   ~ {(t_full-t_noattn)/K*1e3:6.2f} ms/step")
        print(f"pallas launch    ~ {(t_trivial-t_neither)/K*1e3:6.2f} ms/step"
              f" (28 trivial kernels vs pure XLA)")
        print(f"kv-write cost    ~ {(t_full-t_nowrite)/K*1e3:6.2f} ms/step")
        print(f"logits+sample    ~ {(t_neither-t_nologit)/K*1e3:6.2f} ms/step")
        print(f"backbone residual~ {t_nologit/K*1e3:6.2f} ms/step "
              f"(weights+glue; weight-stream floor ~4.4)")


if __name__ == "__main__":
    main()
