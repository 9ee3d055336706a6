"""KV cache manager facade: prefix-cache lookup + slot allocation.

Mirror of the reference's ``vllm/v1/core/kv_cache_manager.py`` for a single
KV-cache group (hybrid multi-group coordination can layer on later). The
scheduler calls:

- ``get_computed_blocks(request)`` — longest prefix-cache hit (capped at
  num_tokens-1 so at least one token is always computed, reference :154);
- ``allocate_slots(request, num_new_tokens, new_computed_blocks)`` — the
  touch → save → allocate → cache pipeline (reference :193);
- ``free(request)`` — release blocks tail-first.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

from vllm_trianglemix_tpu.core.block_pool import BlockPool
from vllm_trianglemix_tpu.core.kv_cache_utils import (
    KVCacheBlock,
    hash_request_tokens,
)
from vllm_trianglemix_tpu.core.kv_cache_interface import KVCacheConfig
from vllm_trianglemix_tpu.core.single_type_kv_cache_manager import (
    cdiv,
    get_manager_for_kv_cache_spec,
)
from vllm_trianglemix_tpu.request import Request


@dataclass
class KVCacheBlocks:
    blocks: list[KVCacheBlock]

    def get_block_ids(self) -> list[int]:
        return [b.block_id for b in self.blocks]

    def __add__(self, other: "KVCacheBlocks") -> "KVCacheBlocks":
        return KVCacheBlocks(self.blocks + other.blocks)


EMPTY_KV_CACHE_BLOCKS = KVCacheBlocks([])


class KVCacheManager:

    def __init__(
        self,
        kv_cache_config: KVCacheConfig,
        max_model_len: int,
        enable_caching: bool = True,
    ) -> None:
        assert len(kv_cache_config.kv_cache_groups) == 1, (
            "single KV-cache group supported; hybrid models need a "
            "coordinator (reference kv_cache_coordinator.py)")
        self.kv_cache_config = kv_cache_config
        group = kv_cache_config.kv_cache_groups[0]
        self.block_size = group.kv_cache_spec.block_size
        self.max_model_len = max_model_len
        self.enable_caching = enable_caching

        self.block_pool = BlockPool(kv_cache_config.num_blocks, enable_caching)
        self.manager = get_manager_for_kv_cache_spec(
            group.kv_cache_spec, self.block_pool)

    # --- stats ----------------------------------------------------------------
    @property
    def usage(self) -> float:
        return self.block_pool.get_usage()

    def get_num_free_blocks(self) -> int:
        return self.block_pool.get_num_free_blocks()

    # --- scheduling interface ---------------------------------------------------
    def get_computed_blocks(self, request: Request) -> tuple[KVCacheBlocks, int]:
        """Longest prefix-cache hit for a WAITING request."""
        if not self.enable_caching:
            return EMPTY_KV_CACHE_BLOCKS, 0

        # Lazily hash the request's full prompt blocks.
        if not request.block_hashes:
            request.block_hashes = hash_request_tokens(
                self.block_size, request.prompt_token_ids,
                salt=request.cache_salt)

        # Cap so at least one token must be computed (sampling needs the
        # logits of the final prompt token; reference kv_cache_manager.py:154).
        max_cache_hit_tokens = request.num_tokens - 1
        max_blocks = max_cache_hit_tokens // self.block_size
        hit_blocks = self.manager.find_longest_cache_hit(
            request.block_hashes, max_blocks)
        num_hit_tokens = len(hit_blocks) * self.block_size
        return KVCacheBlocks(hit_blocks), num_hit_tokens

    def allocate_slots(
        self,
        request: Request,
        num_new_tokens: int,
        num_new_computed_tokens: int = 0,
        new_computed_blocks: Optional[KVCacheBlocks] = None,
    ) -> Optional[KVCacheBlocks]:
        """Allocate room for ``num_new_tokens`` more tokens. Returns None if
        the pool cannot satisfy the request (caller preempts)."""
        assert num_new_tokens > 0
        new_computed = (new_computed_blocks.blocks
                        if new_computed_blocks is not None else [])

        total_tokens = (request.num_computed_tokens + num_new_computed_tokens
                        + num_new_tokens)

        # Free no-longer-needed blocks first (sliding window), so they can
        # be reallocated this very step.
        self.manager.remove_skipped_blocks(request.request_id,
                                           request.num_computed_tokens)

        num_to_allocate = self.manager.get_num_blocks_to_allocate(
            request.request_id, total_tokens, new_computed)
        if num_to_allocate > self.block_pool.get_num_free_blocks():
            return None

        # touch: revive prefix-hit blocks before anything can evict them.
        if new_computed:
            self.block_pool.touch(new_computed)
            self.manager.save_new_computed_blocks(request.request_id,
                                                  new_computed)
        elif request.request_id not in self.manager.num_cached_block:
            self.manager.save_new_computed_blocks(request.request_id, [])

        new_blocks = self.manager.allocate_new_blocks(request.request_id,
                                                      total_tokens)

        if self.enable_caching:
            # Index blocks that will be full after this step's tokens are
            # computed. Caching scheduled-but-not-yet-computed tokens is safe
            # because they are always computed before the next schedule()
            # (same policy as reference kv_cache_manager.py allocate_slots).
            num_cached_tokens = (request.num_computed_tokens
                                 + num_new_computed_tokens + num_new_tokens)
            self.manager.cache_blocks(request, num_cached_tokens)

        return KVCacheBlocks(new_blocks)

    def free(self, request: Request) -> None:
        self.manager.free(request.request_id)

    def get_block_ids(self, request_id: str) -> list[int]:
        return [b.block_id for b in self.manager.get_blocks(request_id)]

    def reset_prefix_cache(self) -> bool:
        return self.block_pool.reset_prefix_cache()

    def num_blocks_for_tokens(self, num_tokens: int) -> int:
        return cdiv(num_tokens, self.block_size)
