"""ChunkedLocalAttentionManager (reference
vllm/v1/core/single_type_kv_cache_manager.py:404) + chunked-local
attention masking (Llama-4 style).

Blocks entirely before the current chunk's start must be nulled out of
the request's table and returned to the pool; the attention mask must
restrict every token to its aligned chunk.
"""

import numpy as np

import jax.numpy as jnp

from tests.core.utils import create_requests
from vllm_trianglemix_tpu.core.kv_cache_interface import (
    ChunkedLocalAttentionSpec,
    KVCacheConfig,
    KVCacheGroupSpec,
)
from vllm_trianglemix_tpu.core.kv_cache_manager import KVCacheManager
from vllm_trianglemix_tpu.core.single_type_kv_cache_manager import (
    ChunkedLocalAttentionManager,
)

BLOCK = 16


def make_mgr(chunk: int, num_blocks: int = 64) -> KVCacheManager:
    spec = ChunkedLocalAttentionSpec(block_size=BLOCK, num_kv_heads=2,
                                     head_size=64, dtype_bytes=2,
                                     attention_chunk_size=chunk)
    cfg = KVCacheConfig(
        num_blocks=num_blocks,
        kv_cache_groups=(KVCacheGroupSpec(("all_layers",), spec),),
    )
    return KVCacheManager(cfg, max_model_len=1024, enable_caching=True)


def test_blocks_before_chunk_start_reclaimed():
    mgr = make_mgr(chunk=64)
    assert isinstance(mgr.manager, ChunkedLocalAttentionManager)
    req = create_requests(1, num_tokens=100)[0]

    blocks = mgr.allocate_slots(req, 100)
    assert blocks is not None
    req.num_computed_tokens = 100
    free_before = mgr.get_num_free_blocks()

    # Next token sits at position 100: its chunk starts at 64 -> blocks
    # 0..3 (tokens 0..63) are dead.
    req.append_output_token_ids(1)
    mgr.allocate_slots(req, 1)
    freed = mgr.get_num_free_blocks() - free_before
    assert freed == 4

    ids = [b.block_id for b in mgr.manager.get_blocks(req.request_id)]
    null_id = mgr.block_pool.null_block.block_id
    assert ids[:4] == [null_id] * 4
    assert all(i != null_id for i in ids[4:])


def test_no_reclaim_within_first_chunk():
    mgr = make_mgr(chunk=128)
    req = create_requests(1, num_tokens=100)[0]
    mgr.allocate_slots(req, 100)
    req.num_computed_tokens = 100
    before = mgr.get_num_free_blocks()
    req.append_output_token_ids(1)
    mgr.allocate_slots(req, 1)
    # position 100 is still in chunk [0, 128): nothing to drop (the
    # decode step may allocate a new block, never frees old ones).
    assert mgr.get_num_free_blocks() <= before


def test_spec_bounds_memory_to_one_chunk():
    spec = ChunkedLocalAttentionSpec(block_size=BLOCK, num_kv_heads=2,
                                     head_size=64, dtype_bytes=2,
                                     attention_chunk_size=64)
    full = spec.max_memory_usage_bytes(1024)
    assert full == ((64 + BLOCK) // BLOCK) * spec.page_size_bytes


def test_chunked_mask_semantics():
    """XLA attention with attn_chunk equals explicit chunk masking."""
    from vllm_trianglemix_tpu.attention.backend import (
        ragged_paged_attention_xla,
        write_to_kv_cache,
    )
    from vllm_trianglemix_tpu.attention.metadata import AttentionMetadata

    T, KH, HQ, D, page = 24, 2, 4, 16, 8
    C = 8                                  # chunk size
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(T, HQ, D)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(T, KH, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(T, KH, D)), jnp.float32)
    cache = jnp.zeros((8, page, 2 * KH, D), jnp.float32)
    slots = jnp.arange(T, dtype=jnp.int32) + page  # blocks 1..3
    cache = write_to_kv_cache(cache, k, v, slots)
    md = AttentionMetadata(
        positions=jnp.arange(T, dtype=jnp.int32),
        req_idx=jnp.zeros(T, jnp.int32),
        slot_mapping=slots,
        block_tables=jnp.asarray([[1, 2, 3]], jnp.int32),
        seq_lens=jnp.asarray([T], jnp.int32),
        prompt_lens=jnp.asarray([T], jnp.int32),
        query_start_loc=jnp.asarray([0, T], jnp.int32),
        logits_indices=jnp.asarray([T - 1], jnp.int32),
        num_reqs=jnp.asarray(1, jnp.int32),
    )
    out = np.asarray(ragged_paged_attention_xla(
        q, cache, md, False, scale=D ** -0.5, tri_enabled=False,
        attn_chunk=C))

    # explicit reference
    kn, vn = np.asarray(k), np.asarray(v)
    ref = np.zeros((T, HQ, D), np.float32)
    G = HQ // KH
    for t in range(T):
        lo = (t // C) * C
        ctx = np.arange(lo, t + 1)
        for h in range(HQ):
            kk = kn[ctx, h // G]
            vv = vn[ctx, h // G]
            s = (np.asarray(q)[t, h] @ kk.T) * D ** -0.5
            p = np.exp(s - s.max())
            p /= p.sum()
            ref[t, h] = p @ vv
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-4)


def test_engine_e2e_chunked_equals_full_for_short_prompts(tiny_model_dir,
                                                         tmp_path):
    """Prompts shorter than one chunk see identical attention, so a
    chunked-local engine must produce identical tokens — and long
    generations still work (block reclamation live)."""
    import json
    import shutil

    from vllm_trianglemix_tpu.entrypoints.llm import LLM
    from vllm_trianglemix_tpu.sampling_params import SamplingParams

    d = tmp_path / "chunked"
    shutil.copytree(tiny_model_dir, d)
    with open(d / "config.json") as f:
        cfg = json.load(f)
    cfg["attention_chunk_size"] = 64
    with open(d / "config.json", "w") as f:
        json.dump(cfg, f)

    kw = dict(dtype="float32", max_model_len=128, max_num_seqs=2,
              max_num_batched_tokens=64, num_kv_blocks=32,
              skip_tokenizer_init=True)
    params = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True)
    prompt = list(range(5, 25))            # 20 tokens + 8 decode < 64
    full = LLM(model=tiny_model_dir, **kw).generate(
        [prompt], params)[0].outputs[0].token_ids
    chunked_llm = LLM(model=str(d), **kw)
    runner = chunked_llm.llm_engine.engine_core.executor.worker.model_runner
    assert runner.cfg.attention_chunk_size == 64
    chunked = chunked_llm.generate([prompt], params)[0].outputs[0].token_ids
    assert list(chunked) == list(full)

    # long generation crossing chunk boundaries completes
    out = chunked_llm.generate(
        [list(range(30, 50))],
        SamplingParams(temperature=0.0, max_tokens=60,
                       ignore_eos=True))[0]
    assert len(out.outputs[0].token_ids) == 60
