"""Quantized linear: quantize/dequantize accuracy, AWQ/GPTQ ingest vs an
independent transcription of the reference packing (quant_utils.py:480-600),
and end-to-end engine generation under quantization."""

import numpy as np
import pytest

import jax.numpy as jnp

from vllm_trianglemix_tpu.quantization.ingest import (
    AWQ_INTERLEAVE,
    load_awq_linear,
    load_gptq_linear,
)
from vllm_trianglemix_tpu.quantization.linear import (
    QuantLinear,
    apply_linear,
    dequantize,
    quantize_fp8,
    quantize_int4,
    quantize_int8,
    quantize_params,
)


def rel_err(a, b):
    return np.abs(a - b).max() / (np.abs(b).max() + 1e-9)


@pytest.mark.parametrize("quantizer,tol", [
    (quantize_int8, 1.2e-2),
    (quantize_int4, 1.2e-1),
    (quantize_fp8, 8e-2),
])
def test_quantize_dequantize_roundtrip(quantizer, tol):
    rng = np.random.default_rng(0)
    w = rng.standard_normal((64, 96)).astype(np.float32)
    q = quantizer(jnp.asarray(w))
    wd = np.asarray(dequantize(q, jnp.float32))
    assert rel_err(wd, w) < tol


@pytest.mark.parametrize("quantizer,tol", [
    (quantize_int8, 2e-2),
    (quantize_int4, 2e-1),
    (quantize_fp8, 1e-1),
])
def test_apply_linear_matches_dense(quantizer, tol):
    rng = np.random.default_rng(1)
    w = rng.standard_normal((64, 96)).astype(np.float32)
    x = rng.standard_normal((8, 64)).astype(np.float32)
    y_dense = x @ w
    y_q = np.asarray(apply_linear(jnp.asarray(x), quantizer(jnp.asarray(w))))
    assert rel_err(y_q, y_dense) < tol


def test_stacked_layer_axis():
    rng = np.random.default_rng(2)
    w = rng.standard_normal((3, 32, 48)).astype(np.float32)  # [L, Din, Dout]
    q = quantize_int4(jnp.asarray(w))
    wd = np.asarray(dequantize(q, jnp.float32))
    assert wd.shape == w.shape
    assert rel_err(wd, w) < 1.2e-1


# --- reference packing transcriptions (quant_utils.py:480-600) -------------

def ref_pack_rows(q_w, bits=4):
    factor = 32 // bits
    K, N = q_w.shape
    out = np.zeros((K // factor, N), np.uint32)
    for i in range(factor):
        out |= q_w[i::factor, :].astype(np.uint32) << (bits * i)
    return out.astype(np.int32)


def ref_pack_cols(q_w, bits=4):
    factor = 32 // bits
    K, N = q_w.shape
    out = np.zeros((K, N // factor), np.uint32)
    for i in range(factor):
        out |= q_w[:, i::factor].astype(np.uint32) << (bits * i)
    return out.astype(np.int32)


def awq_pack(q_w, bits=4):
    K, N = q_w.shape
    interleaved = q_w.reshape(-1, 8)[:, AWQ_INTERLEAVE].ravel().reshape(K, N)
    return ref_pack_cols(interleaved, bits)


def test_awq_ingest_matches_reference_semantics():
    rng = np.random.default_rng(3)
    K, N, G = 32, 64, 4
    q = rng.integers(0, 16, size=(K, N)).astype(np.uint32)
    z = rng.integers(0, 16, size=(G, N)).astype(np.uint32)
    s = (rng.random((G, N)).astype(np.float32) + 0.5)

    tensors = {
        "w.qweight": awq_pack(q),
        "w.qzeros": awq_pack(z),
        "w.scales": s.astype(np.float16),
    }
    packed, scales, zeros = load_awq_linear(tensors.__getitem__, "w")
    ql = QuantLinear(qweight=jnp.asarray(packed),
                     scale=jnp.asarray(scales),
                     zero=jnp.asarray(zeros))
    wd = np.asarray(dequantize(ql, jnp.float32))
    expected = (q.astype(np.float32)
                - np.repeat(z, K // G, axis=0)) * np.repeat(
                    s.astype(np.float16).astype(np.float32), K // G, axis=0)
    np.testing.assert_allclose(wd, expected, rtol=1e-3, atol=1e-3)


def test_gptq_ingest_matches_reference_semantics():
    rng = np.random.default_rng(4)
    K, N, G = 32, 64, 4
    q = rng.integers(0, 16, size=(K, N)).astype(np.uint32)
    z_stored = rng.integers(0, 15, size=(G, N)).astype(np.uint32)
    s = (rng.random((G, N)).astype(np.float32) + 0.5)

    tensors = {
        "w.qweight": ref_pack_rows(q),
        "w.qzeros": ref_pack_cols(z_stored),
        "w.scales": s.astype(np.float16),
        "w.g_idx": np.arange(K) // (K // G),
    }
    packed, scales, zeros = load_gptq_linear(tensors.__getitem__, "w")
    ql = QuantLinear(qweight=jnp.asarray(packed),
                     scale=jnp.asarray(scales),
                     zero=jnp.asarray(zeros))
    wd = np.asarray(dequantize(ql, jnp.float32))
    true_zero = z_stored.astype(np.float32) + 1.0  # format off-by-one
    expected = (q.astype(np.float32)
                - np.repeat(true_zero, K // G, axis=0)) * np.repeat(
                    s.astype(np.float16).astype(np.float32), K // G, axis=0)
    np.testing.assert_allclose(wd, expected, rtol=1e-3, atol=1e-3)


def test_gptq_act_order_rejected():
    rng = np.random.default_rng(5)
    K, N, G = 32, 64, 4
    tensors = {
        "w.qweight": ref_pack_rows(
            rng.integers(0, 16, size=(K, N)).astype(np.uint32)),
        "w.qzeros": ref_pack_cols(
            rng.integers(0, 15, size=(G, N)).astype(np.uint32)),
        "w.scales": rng.random((G, N)).astype(np.float16),
        "w.g_idx": rng.permutation(np.arange(K) // (K // G)),
    }
    with pytest.raises(NotImplementedError):
        load_gptq_linear(tensors.__getitem__, "w")


# --- end-to-end ---------------------------------------------------------------

@pytest.mark.parametrize("method", ["int8", "int4", "fp8"])
def test_engine_generates_under_quantization(tiny_model_dir, method):
    from vllm_trianglemix_tpu.entrypoints.llm import LLM
    from vllm_trianglemix_tpu.sampling_params import SamplingParams

    llm = LLM(model=tiny_model_dir, dtype="float32", max_model_len=128,
              max_num_seqs=4, max_num_batched_tokens=64, num_kv_blocks=32,
              quantization=method)
    outs = llm.generate([[5, 6, 7, 8]],
                        SamplingParams(max_tokens=4, temperature=0.0,
                                       ignore_eos=True))
    assert len(outs[0].outputs[0].token_ids) == 4


def test_quantized_logits_close_to_dense():
    from vllm_trianglemix_tpu.config import TriangleMixConfig
    from vllm_trianglemix_tpu.models import qwen3
    from tests.models.test_qwen3_vs_hf import single_seq_metadata
    from vllm_trianglemix_tpu.attention.backend import kv_cache_shape

    cfg = qwen3.Qwen3Config(vocab_size=256, hidden_size=64,
                            intermediate_size=128, num_hidden_layers=2,
                            num_attention_heads=4, num_key_value_heads=2,
                            head_dim=16)
    params = qwen3.init_random(cfg, seed=0, dtype=jnp.float32)
    qparams = quantize_params(params, "int8")

    token_ids = np.arange(20) % 256
    block_size = 8
    num_blocks = 6
    md = single_seq_metadata(20, block_size, num_blocks)

    def logits(p):
        kv = jnp.zeros((cfg.num_hidden_layers,
                        *kv_cache_shape(num_blocks, block_size,
                                        cfg.num_key_value_heads,
                                        cfg.head_dim)), jnp.float32)
        h, _ = qwen3.forward(p, cfg, TriangleMixConfig(),
                             jnp.asarray(token_ids, jnp.int32), kv, md,
                             jnp.zeros(cfg.num_hidden_layers, bool))
        return np.asarray(qwen3.compute_logits(p, cfg, h))

    dense = logits(params)
    quant = logits(qparams)
    # int8 weight-only should track dense logits closely
    assert np.abs(dense - quant).max() < 0.15 * np.abs(dense).max()
