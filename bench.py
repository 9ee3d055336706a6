#!/usr/bin/env python
"""Headline benchmark: the reference's TPU perf-regression workload.

Reference tests/v1/tpu/test_perf.py:57-74 — 64 requests, each 500 prompt
tokens + 50 decode tokens, Qwen2.5-1.5B-class model, bf16, max_model_len
1024, max_num_seqs 32 — reported 1.7 s +- 0.2 per full batch on TPU v6e-1
(1.4 s on v5e).  We replicate the exact workload shape through the full
engine (scheduler -> runner -> paged attention -> sampler) with random
weights (tokens/s is weight-value independent) and report the mean batch
wall time.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline > 1.0 means faster than the reference's 1.7 s number.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

BASELINE_BATCH_S = 1.7  # TPU v6e-1 (BASELINE.md row 1)

NUM_REQS = 64
PROMPT_LEN = 500
DECODE_LEN = 50

# Qwen2.5-1.5B-Instruct geometry (hidden 1536, 28 layers, 12 q heads,
# 2 kv heads, head_dim 128, inter 8960) expressed as a Qwen3 config —
# q/k-norm adds negligible FLOPs; attention/GEMM shapes match.
MODEL_CONFIG = {
    "architectures": ["Qwen3ForCausalLM"],
    "vocab_size": 151936,
    "hidden_size": 1536,
    "intermediate_size": 8960,
    "num_hidden_layers": 28,
    "num_attention_heads": 12,
    "num_key_value_heads": 2,
    "head_dim": 128,
    "rms_norm_eps": 1e-6,
    "rope_theta": 1000000.0,
    "tie_word_embeddings": True,
    "max_position_embeddings": 32768,
}


def run_batch(llm, prompts, params) -> float:
    t0 = time.perf_counter()
    outs = llm.generate(prompts, params)
    dt = time.perf_counter() - t0
    assert all(len(o.outputs[0].token_ids) == DECODE_LEN for o in outs)
    return dt


def run_config(multi_step: int) -> tuple[float, float]:
    """Returns (mean batch seconds, warmup seconds)."""
    import numpy as np

    from vllm_trianglemix_tpu.entrypoints.llm import LLM
    from vllm_trianglemix_tpu.sampling_params import SamplingParams

    with tempfile.TemporaryDirectory() as d:
        with open(os.path.join(d, "config.json"), "w") as f:
            json.dump(MODEL_CONFIG, f)

        t0 = time.perf_counter()
        llm = LLM(
            model=d,
            dtype="bfloat16",
            max_model_len=1024,
            block_size=128,
            max_num_seqs=32,
            max_num_batched_tokens=8192,
            skip_tokenizer_init=True,
            load_format="dummy",
            multi_step_decode=multi_step,
        )
        rng = np.random.default_rng(0)
        prompts = [rng.integers(1, 50000, size=PROMPT_LEN).tolist()
                   for _ in range(NUM_REQS)]
        params = SamplingParams(max_tokens=DECODE_LEN, temperature=0.0,
                                ignore_eos=True)

        run_batch(llm, prompts, params)  # warmup: compiles the used buckets
        warmup_s = time.perf_counter() - t0
        times = [run_batch(llm, prompts, params) for _ in range(3)]
    return sum(times) / len(times), warmup_s


def _cache_entries() -> int:
    """Entries in the persistent XLA compile cache (warmup forensics:
    warm cache => warmup is tens of seconds; cold => every bucket
    compiles, ~80 s measured locally on v5e — VERDICT r4 weak #2)."""
    try:
        from vllm_trianglemix_tpu import envs

        path = envs.VTT_XLA_CACHE_PATH
        if path and os.path.isdir(path):
            return len(os.listdir(path))
    except Exception:  # noqa: BLE001
        pass
    return -1


def main() -> None:
    cache_before = _cache_entries()
    config = "multi_step=50"
    try:
        value, warmup_s = run_config(multi_step=50)
    except Exception as e:  # noqa: BLE001 — never lose the bench number
        print(f"multi-step bench failed ({type(e).__name__}: {e}); "
              "falling back to single-step", file=sys.stderr)
        config = "multi_step=1 (FALLBACK — multi-step path failed)"
        value, warmup_s = run_config(multi_step=1)
    cache_after = _cache_entries()
    print(json.dumps({
        "metric": "batch_time_64x(500p+50d)_qwen2.5-1.5b",
        "value": round(value, 3),
        "unit": "s",
        "vs_baseline": round(BASELINE_BATCH_S / value, 3),
        "config": config,
        "warmup_s": round(warmup_s, 1),
        # compile-cache forensics: misses == entries written this run
        "xla_cache_entries": cache_after,
        "xla_cache_misses": (cache_after - cache_before
                             if cache_before >= 0 and cache_after >= 0
                             else None),
    }))


if __name__ == "__main__":
    sys.exit(main())
