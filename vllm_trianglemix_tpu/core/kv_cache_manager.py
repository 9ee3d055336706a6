"""KV cache manager: prefix-cache lookup + slot allocation, coordinating
one or more KV-cache groups.

Mirror of the reference's ``vllm/v1/core/kv_cache_manager.py`` facade plus
the ``kv_cache_coordinator.py`` role for hybrid models: each group of
layers with identical cache semantics (full attention, sliding window)
gets its own SingleTypeKVCacheManager and its own per-request block
lists, all drawing from ONE shared BlockPool — a sliding-window group
keeps reclaiming out-of-window blocks into the pool while the
full-attention group holds the whole context. The scheduler calls:

- ``get_computed_blocks(request)`` — longest prefix-cache hit (capped at
  num_tokens-1 so at least one token is always computed, reference :154);
  hybrid (multi-group) configurations currently skip prefix caching,
  like the reference before its hybrid-hit support landed;
- ``allocate_slots(request, num_new_tokens, new_computed_blocks)`` — the
  touch → save → allocate → cache pipeline (reference :193), fanned out
  across groups with a pooled admission check;
- ``free(request)`` — release blocks tail-first in every group.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Union

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
    """Per-group new-block lists (single-group callers see flat lists)."""

    groups: list[list[KVCacheBlock]]

    @property
    def blocks(self) -> list[KVCacheBlock]:
        assert len(self.groups) == 1
        return self.groups[0]

    def get_block_ids(self) -> Union[list[int], list[list[int]]]:
        if len(self.groups) == 1:
            return [b.block_id for b in self.groups[0]]
        return [[b.block_id for b in g] for g in self.groups]

    def __add__(self, other: "KVCacheBlocks") -> "KVCacheBlocks":
        return KVCacheBlocks(
            [a + b for a, b in zip(self.groups, other.groups)])


EMPTY_KV_CACHE_BLOCKS = KVCacheBlocks([[]])


class KVCacheManager:

    def __init__(
        self,
        kv_cache_config: KVCacheConfig,
        max_model_len: int,
        enable_caching: bool = True,
    ) -> None:
        self.kv_cache_config = kv_cache_config
        groups = kv_cache_config.kv_cache_groups
        self.n_groups = len(groups)
        sizes = {g.kv_cache_spec.block_size for g in groups}
        assert len(sizes) == 1, "groups must share one block_size"
        self.block_size = groups[0].kv_cache_spec.block_size
        self.max_model_len = max_model_len
        # Hybrid-group prefix caching needs aligned per-group hits
        # (reference kv_cache_coordinator hybrid logic) — off for now.
        self.enable_caching = enable_caching and self.n_groups == 1

        self.block_pool = BlockPool(kv_cache_config.num_blocks,
                                    self.enable_caching)
        self.managers = [
            get_manager_for_kv_cache_spec(g.kv_cache_spec, self.block_pool)
            for g in groups
        ]
        self.manager = self.managers[0]  # single-group convenience

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
            return KVCacheBlocks([[] for _ in self.managers]), 0

        # Lazily hash the request's full prompt blocks.
        if not request.block_hashes:
            request.block_hashes = hash_request_tokens(
                self.block_size, request.prompt_token_ids,
                salt=request.cache_salt,
                extra_keys_at=request.mm_extra_keys(self.block_size))

        # Cap so at least one token must be computed (sampling needs the
        # logits of the final prompt token; reference kv_cache_manager.py:154).
        max_cache_hit_tokens = request.num_tokens - 1
        max_blocks = max_cache_hit_tokens // self.block_size
        hit_blocks = self.manager.find_longest_cache_hit(
            request.block_hashes, max_blocks)
        num_hit_tokens = len(hit_blocks) * self.block_size
        return KVCacheBlocks([hit_blocks]), num_hit_tokens

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
        new_computed = (new_computed_blocks.groups[0]
                        if new_computed_blocks is not None else [])

        total_tokens = (request.num_computed_tokens + num_new_computed_tokens
                        + num_new_tokens)

        # Free no-longer-needed blocks first (sliding window), so they can
        # be reallocated this very step.
        for mgr in self.managers:
            mgr.remove_skipped_blocks(request.request_id,
                                      request.num_computed_tokens)

        num_to_allocate = sum(
            mgr.get_num_blocks_to_allocate(
                request.request_id, total_tokens,
                new_computed if gi == 0 else [])
            for gi, mgr in enumerate(self.managers))
        if num_to_allocate > self.block_pool.get_num_free_blocks():
            return None

        # touch: revive prefix-hit blocks before anything can evict them.
        if new_computed:
            self.block_pool.touch(new_computed)
            self.manager.save_new_computed_blocks(request.request_id,
                                                  new_computed)
        elif request.request_id not in self.manager.num_cached_block:
            for mgr in self.managers:
                mgr.save_new_computed_blocks(request.request_id, [])

        new_groups = [
            mgr.allocate_new_blocks(request.request_id, total_tokens)
            for mgr in self.managers
        ]

        if self.enable_caching:
            # Index blocks that will be full after this step's tokens are
            # computed. Caching scheduled-but-not-yet-computed tokens is safe
            # because they are always computed before the next schedule()
            # (same policy as reference kv_cache_manager.py allocate_slots).
            num_cached_tokens = (request.num_computed_tokens
                                 + num_new_computed_tokens + num_new_tokens)
            self.manager.cache_blocks(request, num_cached_tokens)

        return KVCacheBlocks(new_groups)

    def free(self, request: Request) -> None:
        for mgr in self.managers:
            mgr.free(request.request_id)

    def get_block_ids(self, request_id: str
                      ) -> Union[list[int], list[list[int]]]:
        if self.n_groups == 1:
            return [b.block_id for b in self.manager.get_blocks(request_id)]
        return [[b.block_id for b in mgr.get_blocks(request_id)]
                for mgr in self.managers]

    def reset_prefix_cache(self) -> bool:
        return self.block_pool.reset_prefix_cache()

    def num_blocks_for_tokens(self, num_tokens: int) -> int:
        return cdiv(num_tokens, self.block_size)
