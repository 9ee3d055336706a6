#!/usr/bin/env python
"""TriangleMix attention speedup on TPU: dense vs triangle prefill.

Measures the isolated ragged-paged-attention kernel on one long prefill
at several sequence lengths. The reference claims ~4x attention-compute
reduction at seq 4096 (TRIANGLEMIX_QUICK_REFERENCE.md:268-276) but never
wired the mask into attention; here the middle KV blocks are actually
skipped (no DMA, no FLOPs).
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from tests.attention.test_pallas_kernel import build_batch  # noqa: E402
from vllm_trianglemix_tpu.ops.ragged_paged_attention import (  # noqa: E402
    ragged_paged_attention_pallas,
)

PAGE = 16


def bench_one(seq_len: int, use_triangle: bool, iters: int = 10) -> float:
    q, cache, md = build_batch(
        [(seq_len, seq_len, seq_len)], num_kv_heads=8, num_q_heads=32,
        head_dim=128, max_blocks=seq_len // PAGE, dtype=jnp.bfloat16)
    kwargs = dict(scale=128 ** -0.5, sink=4, window=32, last=64,
                  dense_threshold=2048)

    def run(i):
        # vary the input so no layer of the stack can cache the result,
        # and force a value fetch so async dispatch can't hide execution
        out = ragged_paged_attention_pallas(q + i * 1e-6, cache, md,
                                            use_triangle, **kwargs)
        return float(out[0, 0, 0])

    run(0)  # compile
    t0 = time.perf_counter()
    for i in range(1, iters + 1):
        run(i)
    return (time.perf_counter() - t0) / iters


def quality_delta(seq_len: int = 4096, model_dir: str | None = None,
                  last_k: int = 64) -> dict:
    """Dense-vs-TriangleMix logit divergence on one long prompt.

    BASELINE.md's north star is "lm-eval delta vs dense within +-0.5%";
    until a real-checkpoint eval runs (vtt eval-gsm8k with/without
    --trianglemix), this reports the upstream proxy: greedy top-1
    agreement and mean KL between dense and triangle logits over the last
    ``last_k`` prompt positions. With ``model_dir`` the numbers are for
    real weights; default is the bench's random-init 1.5B geometry
    (plumbing + kernel-effect check).
    """
    import json
    import os
    import sys as _sys
    import tempfile

    _sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from bench import MODEL_CONFIG

    from vllm_trianglemix_tpu.attention.metadata import AttentionMetadata
    from vllm_trianglemix_tpu.config import TriangleMixConfig
    from vllm_trianglemix_tpu.models.registry import resolve_model

    if model_dir is None:
        tmp = tempfile.mkdtemp()
        with open(os.path.join(tmp, "config.json"), "w") as f:
            json.dump(MODEL_CONFIG, f)
        model_dir = tmp
    model, cfg = resolve_model(model_dir)
    params = model.init_random(cfg, 0, dtype=jnp.bfloat16)
    tri_cfg = TriangleMixConfig(enabled=True)

    page = 128
    blocks = -(-seq_len // page)
    from vllm_trianglemix_tpu.attention.backend import kv_cache_shape

    rng = np.random.default_rng(0)
    tokens = jnp.asarray(rng.integers(1, cfg.vocab_size - 1, seq_len),
                         jnp.int32)
    pos = np.arange(seq_len, dtype=np.int32)
    md = AttentionMetadata(
        positions=jnp.asarray(pos),
        req_idx=jnp.zeros(seq_len, jnp.int32),
        slot_mapping=jnp.asarray(pos),
        block_tables=jnp.arange(blocks, dtype=jnp.int32)[None, :],
        seq_lens=jnp.asarray([seq_len], jnp.int32),
        prompt_lens=jnp.asarray([seq_len], jnp.int32),
        query_start_loc=jnp.asarray([0, seq_len], jnp.int32),
        logits_indices=jnp.asarray(
            np.arange(seq_len - last_k, seq_len, dtype=np.int32)),
        num_reqs=jnp.asarray(1, jnp.int32),
    )

    def logits_for(triangle: bool):
        kv = jnp.zeros((cfg.num_hidden_layers,
                        *kv_cache_shape(blocks + 1, page,
                                        cfg.num_key_value_heads,
                                        cfg.head_dim)), jnp.bfloat16)
        flags = jnp.full(cfg.num_hidden_layers, False)
        if triangle:
            sel = tri_cfg.triangle_layers(cfg.num_hidden_layers)
            flags = flags.at[jnp.asarray(list(sel))].set(True)
        hidden, _ = model.forward(params, cfg, tri_cfg, tokens, kv, md,
                                  flags)
        return model.compute_logits(
            params, cfg, hidden[md.logits_indices]).astype(jnp.float32)

    dense = logits_for(False)
    tri = logits_for(True)
    p = jax.nn.log_softmax(dense, axis=-1)
    q = jax.nn.log_softmax(tri, axis=-1)
    kl = jnp.sum(jnp.exp(p) * (p - q), axis=-1)
    top1 = jnp.mean((jnp.argmax(dense, -1) == jnp.argmax(tri, -1))
                    .astype(jnp.float32))
    return {
        "metric": "trianglemix_quality_delta",
        "seq_len": seq_len,
        "last_k": last_k,
        "top1_agreement": round(float(top1), 4),
        "mean_kl": round(float(jnp.mean(kl)), 5),
        "max_kl": round(float(jnp.max(kl)), 5),
    }


def main() -> None:
    import json

    assert jax.default_backend() == "tpu"
    print(f"{'seq':>7} {'dense_ms':>9} {'triangle_ms':>11} {'speedup':>8}")
    for seq in (4096, 8192, 16384):
        dense = bench_one(seq, False) * 1000
        tri = bench_one(seq, True) * 1000
        print(f"{seq:>7} {dense:>9.2f} {tri:>11.2f} {dense / tri:>7.2f}x")
    model_dir = sys.argv[1] if len(sys.argv) > 1 else None
    print(json.dumps(quality_delta(4096, model_dir)))


if __name__ == "__main__":
    main()
