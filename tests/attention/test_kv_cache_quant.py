"""FP8/INT8 KV cache: write-path quantization, kernel parity, engine e2e."""

import jax.numpy as jnp
import numpy as np
import pytest

from vllm_trianglemix_tpu.attention.backend import (
    kv_cache_shape,
    quantize_kv,
    ragged_paged_attention_xla,
    write_to_kv_cache,
)
from vllm_trianglemix_tpu.ops.ragged_paged_attention import (
    ragged_paged_attention_pallas,
)
from tests.attention.test_pallas_kernel import PAGE


def test_quantize_kv_roundtrip_fp8():
    rng = np.random.default_rng(0)
    k = jnp.asarray(rng.standard_normal((8, 2, 16)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((8, 2, 16)), jnp.float32)
    kq, vq = quantize_kv(k, v, jnp.float8_e4m3fn, 0.5, 0.5)
    assert kq.dtype == jnp.float8_e4m3fn
    back = np.asarray(kq.astype(jnp.float32)) * 0.5
    # e4m3 carries ~3 mantissa bits: relative error ~ 1/16
    assert np.abs(back - np.asarray(k)).max() < \
        0.1 * max(1.0, float(np.abs(np.asarray(k)).max()))


def test_quantize_kv_roundtrip_int8():
    rng = np.random.default_rng(1)
    k = jnp.asarray(rng.standard_normal((8, 2, 16)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((8, 2, 16)), jnp.float32)
    scale = 4.0 / 127
    kq, vq = quantize_kv(k, v, jnp.int8, scale, scale)
    assert kq.dtype == jnp.int8
    back = np.asarray(kq, np.float32) * scale
    assert np.abs(back - np.asarray(k)).max() < 0.05


def quantized_batch(cache_dtype, scale, seed=0):
    """Decode-ish batch with a quantized cache written via quantize_kv."""
    from vllm_trianglemix_tpu.attention.metadata import AttentionMetadata

    rng = np.random.default_rng(seed)
    KH, HQ, D, MB = 4, 8, 128, 4
    seqs = [(1, 40, 39), (6, 30, 30)]
    R = len(seqs)
    T = sum(s[0] for s in seqs)
    q = jnp.asarray(rng.standard_normal((T, HQ, D)), jnp.float32)
    cache = jnp.zeros(kv_cache_shape(R * MB, PAGE, KH, D), cache_dtype)

    positions = np.zeros(T, np.int32)
    req_idx = np.zeros(T, np.int32)
    slot_mapping = np.full(T, -1, np.int32)
    bt = np.zeros((R, MB), np.int32)
    seq_lens = np.zeros(R, np.int32)
    qsl = np.zeros(R + 1, np.int32)
    off = 0
    for r, (qlen, kvlen, _) in enumerate(seqs):
        bt[r] = np.arange(r * MB, (r + 1) * MB)
        pos = np.arange(kvlen, dtype=np.int32)
        slots = bt[r][pos // PAGE] * PAGE + pos % PAGE
        k = jnp.asarray(rng.standard_normal((kvlen, KH, D)), jnp.float32)
        v = jnp.asarray(rng.standard_normal((kvlen, KH, D)), jnp.float32)
        kq, vq = quantize_kv(k, v, cache_dtype, scale, scale)
        cache = write_to_kv_cache(cache, kq, vq, jnp.asarray(slots))
        positions[off:off + qlen] = pos[kvlen - qlen:]
        req_idx[off:off + qlen] = r
        slot_mapping[off:off + qlen] = slots[kvlen - qlen:]
        seq_lens[r] = kvlen
        qsl[r + 1] = off + qlen
        off += qlen
    md = AttentionMetadata(
        positions=jnp.asarray(positions), req_idx=jnp.asarray(req_idx),
        slot_mapping=jnp.asarray(slot_mapping),
        block_tables=jnp.asarray(bt), seq_lens=jnp.asarray(seq_lens),
        prompt_lens=jnp.asarray([s[2] for s in seqs], jnp.int32),
        query_start_loc=jnp.asarray(qsl),
        logits_indices=jnp.asarray([0, T - 1], jnp.int32),
        num_reqs=jnp.asarray(R, jnp.int32))
    return q, cache, md


@pytest.mark.parametrize("cache_dtype,scale", [
    (jnp.float8_e4m3fn, 0.25),
    (jnp.int8, 4.0 / 127),
])
def test_kernel_matches_xla_with_quantized_cache(cache_dtype, scale):
    q, cache, md = quantized_batch(cache_dtype, scale)
    common = dict(scale=128 ** -0.5, sink=4, window=32, last=64,
                  dense_threshold=2048)
    ref = ragged_paged_attention_xla(q, cache, md, False, k_scale=scale,
                                     v_scale=scale, **common)
    got = ragged_paged_attention_pallas(q, cache, md, False, k_scale=scale,
                                        v_scale=scale, interpret=True,
                                        **common)
    T = int(md.query_start_loc[-1])
    np.testing.assert_allclose(np.asarray(got[:T], np.float32),
                               np.asarray(ref[:T], np.float32),
                               atol=2e-3, rtol=2e-3)


@pytest.mark.parametrize("kv_dtype,kv_scale", [("fp8", 0.25),
                                               ("int8", 0.05)])
def test_engine_quantized_kv_close_to_full(tiny_model_dir, kv_dtype,
                                           kv_scale):
    from vllm_trianglemix_tpu.entrypoints.llm import LLM
    from vllm_trianglemix_tpu.sampling_params import SamplingParams

    def run(**kw):
        llm = LLM(model=tiny_model_dir, dtype="float32", max_model_len=128,
                  max_num_seqs=4, max_num_batched_tokens=64,
                  num_kv_blocks=48, **kw)
        out = llm.generate(
            [[5, 6, 7, 8, 9]],
            SamplingParams(max_tokens=6, temperature=0.0, ignore_eos=True,
                           logprobs=1))[0]
        return out.outputs[0]

    full = run()
    quant = run(kv_cache_dtype=kv_dtype, kv_cache_scale=kv_scale)
    assert len(quant.token_ids) == 6
    # quantized-KV greedy decoding should track full precision closely on
    # a tiny model; require at least the first tokens to agree
    assert quant.token_ids[0] == full.token_ids[0]
