"""Pallas dequant-GEMM (ops/quantized_matmul.py): packing roundtrip,
interpret-mode equivalence vs the dequantized reference across group
sizes / zero points / batch padding, W4A8 kernel-vs-XLA-emulation parity,
and dispatch plumbing through apply_linear (the marlin/machete role,
reference csrc/quantization/gptq_marlin/gptq_marlin.cu)."""

import numpy as np
import pytest

import jax.numpy as jnp

from vllm_trianglemix_tpu.ops.quantized_matmul import (
    kernel_supported,
    pack_int4,
    quantized_matmul,
    quantized_matmul_a8,
    unpack_int4,
)
from vllm_trianglemix_tpu.quantization.linear import (
    ActQuantLinear,
    QuantLinear,
    apply_linear,
    dequantize,
    quantize_w4a8,
    set_kernel_mode,
)


def rel_err(a, b):
    return np.abs(a - b).max() / (np.abs(b).max() + 1e-9)


def make_int4(rng, K, N, GS, with_zero):
    G = K // GS
    q = rng.integers(-8, 8, size=(K, N)).astype(np.int8)
    s = (rng.random((G, N)).astype(np.float32) + 0.5) * 0.01
    z = (rng.integers(-8, 8, size=(G, N)).astype(np.float32)
         if with_zero else None)
    w = q.astype(np.float32)
    if z is not None:
        w = w - np.repeat(z, GS, 0)
    w = w * np.repeat(s, GS, 0)
    return q, s, z, w


@pytest.mark.parametrize("K", [64, 256, 512, 768])
def test_pack_roundtrip(K):
    rng = np.random.default_rng(0)
    q = rng.integers(-8, 8, size=(K, 96)).astype(np.int8)
    packed = pack_int4(jnp.asarray(q))
    assert packed.shape == (K // 2, 96)
    assert np.array_equal(np.asarray(unpack_int4(packed)), q)
    # numpy backend agrees bit-for-bit with the jnp one
    assert np.array_equal(np.asarray(pack_int4(q, xp=np)),
                          np.asarray(packed))


@pytest.mark.parametrize("K,N,B,GS,with_zero", [
    (512, 256, 48, 128, True),
    (512, 256, 33, 64, True),     # batch padding + sub-128 groups
    (512, 256, 48, 512, False),   # group spans two tiles
    (768, 384, 16, 256, True),    # group == tile
    (512, 256, 48, 128, False),   # symmetric
])
def test_a16_kernel_matches_dequant(K, N, B, GS, with_zero):
    rng = np.random.default_rng(1)
    q, s, z, w = make_int4(rng, K, N, GS, with_zero)
    x = rng.standard_normal((B, K)).astype(np.float32)
    args = [jnp.asarray(x), pack_int4(jnp.asarray(q)), jnp.asarray(s)]
    if z is not None:
        args.append(jnp.asarray(z))
    y = np.asarray(quantized_matmul(*args, interpret=True))
    assert rel_err(y, x @ w) < 2e-2


@pytest.mark.parametrize("GS", [512, 128])
def test_a16_kernel_int8(GS):
    rng = np.random.default_rng(2)
    K, N, B = 512, 256, 48
    G = K // GS
    q8 = rng.integers(-127, 128, size=(K, N)).astype(np.int8)
    s = (rng.random((G, N)).astype(np.float32) + 0.5) * 0.01
    w = q8.astype(np.float32) * np.repeat(s, GS, 0)
    x = rng.standard_normal((B, K)).astype(np.float32)
    y = np.asarray(quantized_matmul(jnp.asarray(x), jnp.asarray(q8),
                                    jnp.asarray(s), interpret=True))
    assert rel_err(y, x @ w) < 2e-2


@pytest.mark.parametrize("GS,with_zero", [(128, True), (64, False)])
def test_a8_kernel_matches_xla_emulation(GS, with_zero):
    """The Pallas W4A8 kernel and apply_linear's XLA fallback implement
    the same arithmetic (per-token int8 activations, int4 weights)."""
    rng = np.random.default_rng(3)
    K, N, B = 512, 256, 24
    q, s, z, w = make_int4(rng, K, N, GS, with_zero)
    x = rng.standard_normal((B, K)).astype(np.float32)
    packed = pack_int4(jnp.asarray(q))
    args = [jnp.asarray(x), packed, jnp.asarray(s)]
    if z is not None:
        args.append(jnp.asarray(z))
    y_kernel = np.asarray(quantized_matmul_a8(*args, interpret=True))

    set_kernel_mode("off")  # force the XLA emulation path
    try:
        ql = ActQuantLinear(packed, jnp.asarray(s),
                            jnp.asarray(z) if z is not None else None)
        y_xla = np.asarray(apply_linear(jnp.asarray(x), ql))
    finally:
        set_kernel_mode("auto")
    # identical int8 activation grid; only summation order differs
    assert rel_err(y_kernel, y_xla) < 1e-5
    # and both track the true product at int8-activation accuracy
    assert rel_err(y_kernel, x @ w) < 3e-2


def test_kernel_supported_predicate():
    assert kernel_supported(32, 8960, 1536, 128)
    assert kernel_supported(64, 1536, 8960, 128)
    assert not kernel_supported(32, 100, 1536, 128)    # K % 256 != 0
    assert not kernel_supported(2048, 8960, 1536, 128)  # compute-bound
    assert not kernel_supported(32, 8960, 1536, 96)     # group misfit


def test_quantize_w4a8_roundtrip_through_apply_linear():
    rng = np.random.default_rng(4)
    w = rng.standard_normal((512, 256)).astype(np.float32) * 0.02
    x = rng.standard_normal((8, 512)).astype(np.float32)
    ql = quantize_w4a8(jnp.asarray(w))
    assert ql.qweight.dtype == jnp.uint8
    y = np.asarray(apply_linear(jnp.asarray(x), ql))
    # int4 group-128 weight error dominates (same 1.2e-1 class as the
    # quantize_int4 roundtrip tolerance above)
    assert rel_err(y, x @ w) < 1.5e-1


def test_dequantize_signed_packed():
    rng = np.random.default_rng(5)
    q, s, z, w = make_int4(rng, 512, 96, 128, True)
    ql = QuantLinear(pack_int4(jnp.asarray(q)), jnp.asarray(s),
                     jnp.asarray(z))
    wd = np.asarray(dequantize(ql, jnp.float32))
    np.testing.assert_allclose(wd, w, rtol=1e-5, atol=1e-6)


def test_engine_generates_under_w4a8(tiny_model_dir):
    from vllm_trianglemix_tpu.entrypoints.llm import LLM
    from vllm_trianglemix_tpu.sampling_params import SamplingParams

    llm = LLM(model=tiny_model_dir, dtype="float32", max_model_len=128,
              max_num_seqs=4, max_num_batched_tokens=64, num_kv_blocks=32,
              quantization="w4a8")
    outs = llm.generate([[5, 6, 7, 8]],
                        SamplingParams(max_tokens=4, temperature=0.0,
                                       ignore_eos=True))
    assert len(outs[0].outputs[0].token_ids) == 4
