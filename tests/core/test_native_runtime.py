"""Native (C++) host runtime vs pure-Python mirrors: exact equality."""

import numpy as np
import pytest

from vllm_trianglemix_tpu.utils import native


@pytest.fixture(scope="module", autouse=True)
def require_native():
    assert native.native_available(), "g++ build of csrc/vtt_runtime.cpp " \
        "failed — native runtime must be available in CI"


def test_hash_native_equals_python():
    rng = np.random.default_rng(0)
    for block_size in (4, 16):
        for n_blocks in (1, 3, 7):
            toks = rng.integers(0, 200_000,
                                size=block_size * n_blocks).tolist()
            for parent in (None, bytes(range(16))):
                a = native.hash_blocks(toks, block_size, parent)
                b = native._hash_blocks_py(toks, block_size, parent)
                assert a == b
                assert len(a) == n_blocks
                assert all(len(d) == 16 for d in a)


def test_hash_chain_property():
    toks = list(range(32))
    multi = native.hash_blocks(toks, 16, None)
    first = native.hash_blocks(toks[:16], 16, None)[0]
    second = native.hash_blocks(toks[16:], 16, first)[0]
    assert multi == [first, second]


def test_hash_sensitivity():
    toks = list(range(16))
    base = native.hash_blocks(toks, 16, None)[0]
    assert native.hash_blocks([1] + toks[1:], 16, None)[0] != base
    assert native.hash_blocks(toks, 16, b"\x01" * 16)[0] != base


def test_ngram_native_equals_python():
    rng = np.random.default_rng(1)
    for _ in range(50):
        toks = rng.integers(0, 5, size=rng.integers(4, 60)).tolist()
        for n in (1, 2, 3):
            for k in (1, 4, 8):
                a = native.ngram_propose(toks, n, k)
                b = native._ngram_propose_py(toks, n, k)
                assert a == b, (toks, n, k)


def test_ngram_most_recent_match_wins():
    #       0  1  2  3  4  5  6  7  8
    toks = [7, 8, 1, 2, 7, 8, 3, 7, 8]
    # suffix (7, 8) most recently occurs at 4..5; continuation 3, 7
    assert native.ngram_propose(toks, 2, 2) == [3, 7]
    assert native.ngram_propose(toks, 2, 1) == [3]


def test_ngram_no_match():
    assert native.ngram_propose([1, 2, 3, 4], 2, 4) == []


def test_prefix_cache_still_works_end_to_end(tiny_llm):
    from vllm_trianglemix_tpu.sampling_params import SamplingParams

    prompt = list(range(10, 50))
    params = SamplingParams(max_tokens=2, temperature=0.0, ignore_eos=True)
    tiny_llm.generate([prompt], params)
    pool = tiny_llm.llm_engine.engine_core.scheduler \
        .kv_cache_manager.block_pool
    before_hits = pool.hit_queries
    tiny_llm.generate([prompt], params)  # same prompt -> prefix hit
    assert pool.hit_queries > before_hits
