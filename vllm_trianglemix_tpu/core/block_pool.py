"""Refcounted KV block pool with a content-addressed prefix-cache index.

Mirror of the reference's ``vllm/v1/core/block_pool.py`` semantics:
- ref_cnt==0 blocks sit in an LRU free queue but keep their hash so they can
  be resurrected by a prefix hit until actually evicted;
- allocating a block evicts its stale cache entry;
- ``cache_full_blocks`` hashes newly-filled blocks into the index.

Block id 0 is the shared *null block* used to pad skipped/unused table
entries; it is never allocated or freed.
"""

from __future__ import annotations

from typing import Optional

from vllm_trianglemix_tpu.core.kv_cache_utils import (
    BlockHash,
    FreeKVCacheBlockQueue,
    KVCacheBlock,
    hash_request_tokens,
)
from vllm_trianglemix_tpu.request import Request


class BlockPool:

    def __init__(self, num_blocks: int, enable_caching: bool = True) -> None:
        if num_blocks < 2:
            raise ValueError("need at least 2 blocks (one null + one usable)")
        self.num_blocks = num_blocks
        self.enable_caching = enable_caching

        self.blocks = [KVCacheBlock(block_id=i) for i in range(num_blocks)]
        self.null_block = self.blocks[0]
        self.null_block.is_null = True
        self.null_block.ref_cnt = 1  # never evicted

        self.free_block_queue = FreeKVCacheBlockQueue(self.blocks[1:])
        # hash -> block (single-valued: one cached copy per content).
        self.cached_block_hash_to_block: dict[BlockHash, KVCacheBlock] = {}

        # stats
        self.hit_queries = 0
        self.total_queries = 0

    # --- queries ------------------------------------------------------------
    def get_num_free_blocks(self) -> int:
        return self.free_block_queue.num_free_blocks

    def get_usage(self) -> float:
        usable = self.num_blocks - 1
        return 1.0 - self.get_num_free_blocks() / usable

    def get_cached_block(self, block_hash: BlockHash) -> Optional[KVCacheBlock]:
        self.total_queries += 1
        block = self.cached_block_hash_to_block.get(block_hash)
        if block is not None:
            self.hit_queries += 1
        return block

    # --- allocation ---------------------------------------------------------
    def get_new_blocks(self, num_blocks: int) -> list[KVCacheBlock]:
        """Pop ``num_blocks`` free blocks (LRU order), evicting any stale
        prefix-cache entries they still carry."""
        if num_blocks > self.get_num_free_blocks():
            raise ValueError(
                f"Cannot allocate {num_blocks} blocks; "
                f"only {self.get_num_free_blocks()} free")
        out = []
        for _ in range(num_blocks):
            block = self.free_block_queue.popleft()
            self._maybe_evict_cached_block(block)
            block.incr_ref()
            out.append(block)
        return out

    def _maybe_evict_cached_block(self, block: KVCacheBlock) -> None:
        if block.block_hash is None:
            return
        self.cached_block_hash_to_block.pop(block.block_hash, None)
        block.reset_hash()

    def touch(self, blocks: list[KVCacheBlock]) -> None:
        """Re-acquire cached blocks for a prefix hit: bump refs and pull
        ref==0 blocks out of the free queue (reference block_pool.py:322)."""
        for block in blocks:
            if block.ref_cnt == 0 and not block.is_null:
                self.free_block_queue.remove(block)
            block.incr_ref()

    def free_blocks(self, ordered_blocks: list[KVCacheBlock]) -> None:
        """Decrement refs; append newly-unreferenced blocks to the free queue
        in the given order (callers pass tail-first so tails evict first)."""
        for block in ordered_blocks:
            if block.is_null:
                continue
            block.decr_ref()
            if block.ref_cnt == 0:
                self.free_block_queue.append(block)

    # --- prefix caching -----------------------------------------------------
    def cache_full_blocks(
        self,
        request: Request,
        blocks: list[KVCacheBlock],
        num_cached_blocks: int,
        num_full_blocks: int,
        block_size: int,
    ) -> None:
        """Hash and index blocks [num_cached_blocks, num_full_blocks) of the
        request (reference block_pool.py:188). Extends request.block_hashes
        lazily, chaining off the last existing hash."""
        if not self.enable_caching or num_full_blocks <= num_cached_blocks:
            return
        if len(request.block_hashes) < num_full_blocks:
            parent = (request.block_hashes[-1].hash_value
                      if request.block_hashes else None)
            new_hashes = hash_request_tokens(
                block_size,
                request.all_token_ids[:num_full_blocks * block_size],
                start_block=len(request.block_hashes),
                parent_hash=parent,
                salt=request.cache_salt,
                extra_keys_at=request.mm_extra_keys(block_size),
            )
            request.block_hashes.extend(new_hashes)

        for i in range(num_cached_blocks, num_full_blocks):
            block = blocks[i]
            if block.block_hash is not None:
                continue  # already cached (e.g. shared via prefix hit)
            block_hash = request.block_hashes[i]
            block.block_hash = block_hash
            self.cached_block_hash_to_block[block_hash] = block

    def reset_prefix_cache(self) -> bool:
        """Drop the whole index (only when nothing is referenced)."""
        if self.get_num_free_blocks() != self.num_blocks - 1:
            return False
        self.cached_block_hash_to_block.clear()
        for block in self.blocks:
            block.reset_hash()
        return True
