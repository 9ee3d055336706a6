from tests.core.utils import create_requests, make_kv_cache_config
from vllm_trianglemix_tpu.core.kv_cache_manager import KVCacheManager


def make_manager(block_size=16, num_blocks=64, enable_caching=True):
    return KVCacheManager(
        make_kv_cache_config(block_size, num_blocks),
        max_model_len=1024,
        enable_caching=enable_caching,
    )


def test_allocate_and_free():
    m = make_manager()
    req = create_requests(1, num_tokens=48)[0]  # 3 blocks of 16
    blocks, hits = m.get_computed_blocks(req)
    assert hits == 0
    new = m.allocate_slots(req, 48, new_computed_blocks=blocks)
    assert new is not None and len(new.blocks) == 3
    assert m.get_num_free_blocks() == 63 - 3
    m.free(req)
    assert m.get_num_free_blocks() == 63


def test_prefix_cache_hit_roundtrip():
    m = make_manager()
    r1, r2 = create_requests(2, num_tokens=48, same_prompt=True)
    blocks, _ = m.get_computed_blocks(r1)
    m.allocate_slots(r1, 48, new_computed_blocks=blocks)
    r1.num_computed_tokens = 48

    # Same prompt: expect a hit on the 2 *full* blocks (48//16=3 full, but
    # hit capped at num_tokens-1 = 47 -> 2 blocks).
    hit_blocks, hits = m.get_computed_blocks(r2)
    assert hits == 32
    assert len(hit_blocks.blocks) == 2
    new = m.allocate_slots(r2, 48 - hits, new_computed_blocks=hit_blocks)
    assert new is not None
    # Shared blocks are refcounted, not copied.
    assert hit_blocks.blocks[0].ref_cnt == 2
    m.free(r1)
    assert hit_blocks.blocks[0].ref_cnt == 1
    m.free(r2)


def test_hit_survives_free_until_eviction():
    m = make_manager(num_blocks=8)  # 7 usable
    r1 = create_requests(1, num_tokens=48)[0]
    blocks, _ = m.get_computed_blocks(r1)
    m.allocate_slots(r1, 48, new_computed_blocks=blocks)
    m.free(r1)
    # All blocks free but the cache still holds them.
    r2 = create_requests(1, num_tokens=48, same_prompt=False)[0]
    r2.prompt_token_ids = list(r1.prompt_token_ids)
    r2._all_token_ids = list(r1.prompt_token_ids)
    hit_blocks, hits = m.get_computed_blocks(r2)
    assert hits == 32


def test_allocation_failure_returns_none():
    m = make_manager(num_blocks=4)  # 3 usable
    req = create_requests(1, num_tokens=100)[0]
    blocks, _ = m.get_computed_blocks(req)
    assert m.allocate_slots(req, 100, new_computed_blocks=blocks) is None


def test_decode_grows_blocks_incrementally():
    m = make_manager(block_size=16)
    req = create_requests(1, num_tokens=16)[0]
    blocks, _ = m.get_computed_blocks(req)
    m.allocate_slots(req, 16, new_computed_blocks=blocks)
    req.num_computed_tokens = 16
    # One more token -> needs a second block.
    req.append_output_token_ids(7)
    new = m.allocate_slots(req, 1)
    assert new is not None and len(new.blocks) == 1
    req.num_computed_tokens = 17
    # Next 15 tokens fit in the same block.
    for t in range(15):
        req.append_output_token_ids(8 + t)
        new = m.allocate_slots(req, 1)
        assert new is not None and len(new.blocks) == 0
        req.num_computed_tokens += 1


def test_caching_disabled():
    m = make_manager(enable_caching=False)
    r1, r2 = create_requests(2, num_tokens=32, same_prompt=True)
    blocks, hits = m.get_computed_blocks(r1)
    assert hits == 0 and not blocks.blocks
    m.allocate_slots(r1, 32, new_computed_blocks=blocks)
    _, hits2 = m.get_computed_blocks(r2)
    assert hits2 == 0
