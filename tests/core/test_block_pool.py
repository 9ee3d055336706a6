from vllm_trianglemix_tpu.core.block_pool import BlockPool
from vllm_trianglemix_tpu.core.kv_cache_utils import (
    FreeKVCacheBlockQueue,
    KVCacheBlock,
    hash_block_tokens,
    hash_request_tokens,
)
from vllm_trianglemix_tpu.request import Request
from vllm_trianglemix_tpu.sampling_params import SamplingParams


def _req(tokens, req_id="r0"):
    return Request(req_id, list(tokens), SamplingParams(max_tokens=4))


def test_hash_chain_depends_on_parent():
    h1 = hash_block_tokens(None, [1, 2, 3])
    h2 = hash_block_tokens(None, [1, 2, 3])
    assert h1 == h2
    h3 = hash_block_tokens(h1.hash_value, [1, 2, 3])
    assert h3 != h1


def test_hash_request_tokens_full_blocks_only():
    hashes = hash_request_tokens(4, list(range(10)))
    assert len(hashes) == 2  # 10 tokens, block 4 -> 2 full blocks
    assert hashes[0].token_ids == (0, 1, 2, 3)
    assert hashes[1].token_ids == (4, 5, 6, 7)
    # Resume mid-chain gives the same result as hashing from scratch.
    resumed = hash_request_tokens(4, list(range(10)), start_block=1,
                                  parent_hash=hashes[0].hash_value)
    assert resumed == hashes[1:]


def test_free_queue_lru_and_middle_removal():
    blocks = [KVCacheBlock(block_id=i) for i in range(4)]
    q = FreeKVCacheBlockQueue(blocks)
    assert q.num_free_blocks == 4
    q.remove(blocks[2])
    assert q.num_free_blocks == 3
    assert [b.block_id for b in q.get_all_free_blocks()] == [0, 1, 3]
    assert q.popleft().block_id == 0
    q.append(blocks[2])
    assert [b.block_id for b in q.get_all_free_blocks()] == [1, 3, 2]


def test_block_pool_allocate_free_cycle():
    pool = BlockPool(num_blocks=11)
    assert pool.get_num_free_blocks() == 10  # one null block
    blocks = pool.get_new_blocks(5)
    assert pool.get_num_free_blocks() == 5
    assert all(b.ref_cnt == 1 for b in blocks)
    pool.free_blocks(list(reversed(blocks)))
    assert pool.get_num_free_blocks() == 10


def test_prefix_cache_hit_and_eviction():
    pool = BlockPool(num_blocks=5)  # 4 usable
    req = _req(range(8))  # 2 full blocks of 4
    blocks = pool.get_new_blocks(2)
    pool.cache_full_blocks(req, blocks, num_cached_blocks=0,
                           num_full_blocks=2, block_size=4)
    assert len(req.block_hashes) == 2
    # Cached lookup works while referenced.
    assert pool.get_cached_block(req.block_hashes[0]) is blocks[0]

    # Free, then hit again via touch (resurrects from free queue).
    pool.free_blocks(list(reversed(blocks)))
    hit = pool.get_cached_block(req.block_hashes[0])
    assert hit is blocks[0]
    pool.touch([hit])
    assert hit.ref_cnt == 1
    assert pool.get_num_free_blocks() == 3
    pool.free_blocks([hit])

    # Exhaust the pool: stale cached entries get evicted on reuse.
    fresh = pool.get_new_blocks(4)
    assert pool.get_cached_block(req.block_hashes[0]) is None
    assert pool.get_cached_block(req.block_hashes[1]) is None
    pool.free_blocks(fresh)


def test_null_block_never_allocated():
    pool = BlockPool(num_blocks=3)
    a = pool.get_new_blocks(2)
    assert all(b.block_id != 0 for b in a)
    assert pool.null_block.block_id == 0
    assert pool.null_block.is_null


def test_reset_prefix_cache_requires_idle():
    pool = BlockPool(num_blocks=4)
    blocks = pool.get_new_blocks(1)
    assert not pool.reset_prefix_cache()
    pool.free_blocks(blocks)
    assert pool.reset_prefix_cache()
