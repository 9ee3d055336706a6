"""Embedding (pooling) requests: LLM.encode + correctness of pooling."""

import numpy as np
import pytest

import jax.numpy as jnp

from vllm_trianglemix_tpu.pooling_params import PoolingParams


def test_encode_last_pooling_matches_forward(tiny_llm):
    """encode() with last-token pooling must equal the normalized final
    hidden state of a direct forward pass."""
    prompt = [5, 6, 7, 8, 9]
    out = tiny_llm.encode([prompt], PoolingParams(pooling_type="last"))[0]
    assert out.finished and out.pooled is not None
    vec = np.asarray(out.pooled)
    assert abs(np.linalg.norm(vec) - 1.0) < 1e-5  # normalized

    # direct forward for ground truth
    from tests.models.test_qwen3_vs_hf import single_seq_metadata
    from vllm_trianglemix_tpu.attention.backend import kv_cache_shape
    from vllm_trianglemix_tpu.config import TriangleMixConfig

    runner = tiny_llm.llm_engine.engine_core.executor.worker.model_runner
    cfg, params = runner.cfg, runner.params
    md = single_seq_metadata(len(prompt), 16, 4)
    kv = jnp.zeros((cfg.num_hidden_layers,
                    *kv_cache_shape(4, 16, cfg.num_key_value_heads,
                                    cfg.head_dim)), jnp.float32)
    hidden, _ = runner.model.forward(
        params, cfg, TriangleMixConfig(),
        jnp.asarray(prompt, jnp.int32), kv, md,
        jnp.zeros(cfg.num_hidden_layers, bool))
    ref = np.asarray(hidden)[-1].astype(np.float64)
    ref = ref / np.linalg.norm(ref)
    np.testing.assert_allclose(vec, ref, atol=1e-4)


def test_encode_batch_and_types(tiny_llm):
    prompts = [[11, 12, 13], [14, 15, 16, 17]]
    for ptype in ("last", "mean", "cls"):
        outs = tiny_llm.encode(prompts, PoolingParams(pooling_type=ptype))
        assert len(outs) == 2
        for o in outs:
            v = np.asarray(o.pooled)
            assert v.shape == (64,)
            assert np.isfinite(v).all()
    # different pooling types give different vectors
    a = np.asarray(tiny_llm.encode(
        [prompts[0]], PoolingParams(pooling_type="last"))[0].pooled)
    b = np.asarray(tiny_llm.encode(
        [prompts[0]], PoolingParams(pooling_type="mean"))[0].pooled)
    assert not np.allclose(a, b)


def test_encode_dimensions_truncation(tiny_llm):
    out = tiny_llm.encode([[21, 22, 23]],
                          PoolingParams(dimensions=16))[0]
    assert len(out.pooled) == 16


def test_mixed_generate_and_encode(tiny_llm):
    """Embedding and generation requests share the engine and batch."""
    from vllm_trianglemix_tpu.sampling_params import SamplingParams

    eng = tiny_llm.llm_engine
    eng.add_request("gen", [3, 4, 5],
                    SamplingParams(max_tokens=4, temperature=0.0,
                                   ignore_eos=True))
    eng.add_request("emb", [6, 7, 8], SamplingParams(max_tokens=1),
                    pooling_params=PoolingParams())
    done = {}
    while eng.has_unfinished_requests():
        for o in eng.step():
            if o.finished:
                done[o.request_id] = o
    assert len(done["gen"].outputs[0].token_ids) == 4
    assert done["emb"].pooled is not None
