"""SlidingWindowManager block reclamation (reference
vllm/v1/core/single_type_kv_cache_manager.py:304 SlidingWindowManager).

Out-of-window KV blocks must be nulled out of the request's table and
returned to the pool while the request keeps decoding.
"""

from tests.core.utils import create_requests, make_kv_cache_config
from vllm_trianglemix_tpu.config import CacheConfig
from vllm_trianglemix_tpu.core.kv_cache_interface import (
    KVCacheConfig,
    KVCacheGroupSpec,
    SlidingWindowSpec,
)
from vllm_trianglemix_tpu.core.kv_cache_manager import KVCacheManager
from vllm_trianglemix_tpu.core.single_type_kv_cache_manager import (
    SlidingWindowManager,
)

BLOCK = 16


def make_swa_manager(window: int, num_blocks: int = 64) -> KVCacheManager:
    spec = SlidingWindowSpec(block_size=BLOCK, num_kv_heads=2, head_size=64,
                             dtype_bytes=2, sliding_window=window)
    cfg = KVCacheConfig(
        num_blocks=num_blocks,
        kv_cache_groups=(KVCacheGroupSpec(("all_layers",), spec),),
    )
    return KVCacheManager(cfg, max_model_len=1024, enable_caching=True)


def test_out_of_window_blocks_are_reclaimed():
    mgr = make_swa_manager(window=32)
    assert isinstance(mgr.manager, SlidingWindowManager)
    req = create_requests(1, num_tokens=100)[0]

    # Prefill all 100 tokens: ceil(100/16) = 7 blocks.
    blocks = mgr.allocate_slots(req, 100)
    assert blocks is not None
    req.num_computed_tokens = 100
    free_before = mgr.get_num_free_blocks()

    # Decode one token: tokens before 100-32=68 are dead -> blocks 0..3
    # (tokens 0..63) can be dropped; block 4 still holds token 64..79
    # (68 is inside it).
    req.append_output_token_ids(1)
    mgr.allocate_slots(req, 1)
    freed = mgr.get_num_free_blocks() - free_before
    assert freed == 4

    ids = [b.block_id for b in mgr.manager.get_blocks(req.request_id)]
    null_id = mgr.block_pool.null_block.block_id
    assert ids[:4] == [null_id] * 4
    assert all(i != null_id for i in ids[4:])


def test_reclaim_is_incremental_and_idempotent():
    mgr = make_swa_manager(window=16)
    req = create_requests(1, num_tokens=64)[0]
    mgr.allocate_slots(req, 64)
    req.num_computed_tokens = 64

    req.append_output_token_ids(1)
    mgr.allocate_slots(req, 1)
    n1 = mgr.get_num_free_blocks()
    # Another decode step inside the same block: nothing more to drop.
    req.num_computed_tokens = 65
    req.append_output_token_ids(1)
    mgr.allocate_slots(req, 1)
    assert mgr.get_num_free_blocks() == n1


def test_freed_blocks_are_reusable_by_other_requests():
    mgr = make_swa_manager(window=16, num_blocks=8)
    a = create_requests(1, num_tokens=80)[0]
    # 5 blocks for a's prefill.
    assert mgr.allocate_slots(a, 80) is not None
    a.num_computed_tokens = 80
    a.append_output_token_ids(1)
    mgr.allocate_slots(a, 1)  # drops blocks before token 64 -> 4 freed

    b = create_requests(1, num_tokens=60)[0]
    got = mgr.allocate_slots(b, 60)  # needs 4 blocks
    assert got is not None
    assert len(got.blocks) == 4


def test_full_attention_config_uses_full_manager():
    # Regression: the default path must stay on FullAttentionManager.
    from vllm_trianglemix_tpu.core.single_type_kv_cache_manager import (
        FullAttentionManager,
    )

    mgr = KVCacheManager(make_kv_cache_config(), max_model_len=1024)
    assert isinstance(mgr.manager, FullAttentionManager)
    assert CacheConfig().block_size  # silence unused-import linters
