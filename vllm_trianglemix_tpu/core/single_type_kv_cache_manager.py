"""Per-attention-type block lifecycle managers.

Mirror of the reference's ``vllm/v1/core/single_type_kv_cache_manager.py``:
a manager owns the per-request block lists for one KV-cache group and knows
that group's semantics — full attention keeps everything; sliding-window
attention can drop (null out) blocks that fell out of the window and can only
serve prefix hits from a suffix of contiguous cached blocks.
"""

from __future__ import annotations

from collections import defaultdict

from vllm_trianglemix_tpu.core.block_pool import BlockPool
from vllm_trianglemix_tpu.core.kv_cache_utils import BlockHash, KVCacheBlock
from vllm_trianglemix_tpu.core.kv_cache_interface import (
    ChunkedLocalAttentionSpec,
    CrossAttentionSpec,
    FullAttentionSpec,
    KVCacheSpec,
    MambaPagesSpec,
    SlidingWindowSpec,
    MLAAttentionSpec,
    MambaSpec,
)
from vllm_trianglemix_tpu.request import Request


def cdiv(a: int, b: int) -> int:
    return -(-a // b)


class SingleTypeKVCacheManager:

    def __init__(self, kv_cache_spec: KVCacheSpec, block_pool: BlockPool) -> None:
        self.kv_cache_spec = kv_cache_spec
        self.block_size = kv_cache_spec.block_size
        self.block_pool = block_pool
        self.req_to_blocks: defaultdict[str, list[KVCacheBlock]] = defaultdict(list)
        # blocks hit in the prefix cache at schedule time, not yet saved
        self.num_cached_block: dict[str, int] = {}

    # --- prefix cache lookup -------------------------------------------------
    def find_longest_cache_hit(self, block_hashes: list[BlockHash],
                               max_num_blocks: int) -> list[KVCacheBlock]:
        raise NotImplementedError

    # --- allocation ------------------------------------------------------------
    def get_num_blocks_to_allocate(self, request_id: str, num_tokens: int,
                                   new_computed_blocks: list[KVCacheBlock]) -> int:
        num_required = cdiv(num_tokens, self.block_size)
        num_have = len(self.req_to_blocks[request_id]) + len(new_computed_blocks)
        return max(0, num_required - num_have)

    def save_new_computed_blocks(
            self, request_id: str,
            new_computed_blocks: list[KVCacheBlock]) -> None:
        """Attach prefix-hit blocks to the request (refs already touched)."""
        blocks = self.req_to_blocks[request_id]
        assert not blocks or not new_computed_blocks, \
            "prefix hits only apply to brand-new requests"
        blocks.extend(new_computed_blocks)
        if request_id not in self.num_cached_block:
            self.num_cached_block[request_id] = len(new_computed_blocks)

    def allocate_new_blocks(self, request_id: str,
                            num_tokens: int) -> list[KVCacheBlock]:
        blocks = self.req_to_blocks[request_id]
        num_required = cdiv(num_tokens, self.block_size)
        num_new = num_required - len(blocks)
        if num_new <= 0:
            return []
        new_blocks = self.block_pool.get_new_blocks(num_new)
        blocks.extend(new_blocks)
        return new_blocks

    def cache_blocks(self, request: Request, num_tokens: int) -> None:
        """Index all blocks full at ``num_tokens`` into the prefix cache."""
        # Only tokens whose ids are known can be hashed (scheduled tokens are
        # always <= request.num_tokens at schedule time; clamp defensively).
        num_full = min(num_tokens, request.num_tokens) // self.block_size
        num_cached = self.num_cached_block.get(request.request_id, 0)
        if num_full > num_cached:
            self.block_pool.cache_full_blocks(
                request,
                self.req_to_blocks[request.request_id],
                num_cached_blocks=num_cached,
                num_full_blocks=num_full,
                block_size=self.block_size,
            )
            self.num_cached_block[request.request_id] = num_full

    def free(self, request_id: str) -> None:
        # Reverse order => tail blocks evict before the prefix (reference
        # scheduler.py:1147-1165 tail-first eviction policy).
        blocks = self.req_to_blocks.pop(request_id, [])
        self.block_pool.free_blocks(list(reversed(blocks)))
        self.num_cached_block.pop(request_id, None)

    def get_blocks(self, request_id: str) -> list[KVCacheBlock]:
        return self.req_to_blocks[request_id]

    def remove_skipped_blocks(self, request_id: str,
                              num_computed_tokens: int) -> None:
        """Drop blocks that attention will never read again (no-op for
        full attention)."""


class FullAttentionManager(SingleTypeKVCacheManager):

    def find_longest_cache_hit(self, block_hashes: list[BlockHash],
                               max_num_blocks: int) -> list[KVCacheBlock]:
        hit: list[KVCacheBlock] = []
        for bh in block_hashes[:max_num_blocks]:
            block = self.block_pool.get_cached_block(bh)
            if block is None:
                break
            hit.append(block)
        return hit


class SlidingWindowManager(SingleTypeKVCacheManager):

    def __init__(self, kv_cache_spec: SlidingWindowSpec,
                 block_pool: BlockPool) -> None:
        super().__init__(kv_cache_spec, block_pool)
        self.sliding_window = kv_cache_spec.sliding_window
        self._null_block = block_pool.null_block

    def find_longest_cache_hit(self, block_hashes: list[BlockHash],
                               max_num_blocks: int) -> list[KVCacheBlock]:
        # A sliding-window hit must cover the *tail* of the match window;
        # we only accept a hit that is a contiguous prefix too (simpler and
        # always correct: a conservative subset of the reference's policy).
        return FullAttentionManager.find_longest_cache_hit(
            self, block_hashes, max_num_blocks)

    def remove_skipped_blocks(self, request_id: str,
                              num_computed_tokens: int) -> None:
        # Tokens before (num_computed_tokens - sliding_window) are dead.
        last_useful_token = num_computed_tokens - self.sliding_window
        if last_useful_token <= 0:
            return
        last_useful_block = last_useful_token // self.block_size
        blocks = self.req_to_blocks[request_id]
        removed: list[KVCacheBlock] = []
        for i in range(min(last_useful_block, len(blocks)) - 1, -1, -1):
            if blocks[i].is_null:
                break  # everything before is already null
            removed.append(blocks[i])
            blocks[i] = self._null_block
        self.block_pool.free_blocks(removed)


class ChunkedLocalAttentionManager(SingleTypeKVCacheManager):
    """Chunked-local block lifecycle (reference
    ChunkedLocalAttentionManager, single_type_kv_cache_manager.py:404):
    blocks entirely before the current chunk's start are dead — no later
    token can ever attend to them — and return to the pool as null."""

    def __init__(self, kv_cache_spec, block_pool: BlockPool) -> None:
        super().__init__(kv_cache_spec, block_pool)
        self.chunk = kv_cache_spec.attention_chunk_size
        self._null_block = block_pool.null_block

    def find_longest_cache_hit(self, block_hashes: list[BlockHash],
                               max_num_blocks: int) -> list[KVCacheBlock]:
        # Conservative contiguous-prefix policy (same rationale as the
        # sliding-window manager).
        return FullAttentionManager.find_longest_cache_hit(
            self, block_hashes, max_num_blocks)

    def remove_skipped_blocks(self, request_id: str,
                              num_computed_tokens: int) -> None:
        # The NEXT token to compute sits at position num_computed_tokens;
        # its chunk starts at floor(pos / C) * C — everything before is
        # invisible to every present and future token.
        last_useful_token = (num_computed_tokens // self.chunk) * self.chunk
        if last_useful_token <= 0:
            return
        last_useful_block = last_useful_token // self.block_size
        blocks = self.req_to_blocks[request_id]
        removed: list[KVCacheBlock] = []
        for i in range(min(last_useful_block, len(blocks)) - 1, -1, -1):
            if blocks[i].is_null:
                break
            removed.append(blocks[i])
            blocks[i] = self._null_block
        self.block_pool.free_blocks(removed)


class MambaManager(FullAttentionManager):
    """Constant-size state slots (reference MambaManager,
    single_type_kv_cache_manager.py:529): one block per request for its
    whole lifetime; state content is positional, never prefix-cacheable."""

    def find_longest_cache_hit(self, block_hashes, max_blocks):
        return []


class ConstantPagesManager(SingleTypeKVCacheManager):
    """Base for groups whose per-request block count is FIXED for the
    request's lifetime, independent of decoder token growth: allocated
    up front, never reclaimed early, never prefix-cached."""

    def _num_pages(self) -> int:
        raise NotImplementedError

    def find_longest_cache_hit(self, block_hashes, max_blocks):
        return []

    def get_num_blocks_to_allocate(self, request_id: str, num_tokens: int,
                                   new_computed_blocks) -> int:
        return max(0, self._num_pages()
                   - len(self.req_to_blocks[request_id]))

    def allocate_new_blocks(self, request_id: str, num_tokens: int):
        blocks = self.req_to_blocks[request_id]
        num_new = self._num_pages() - len(blocks)
        if num_new <= 0:
            return []
        new_blocks = self.block_pool.get_new_blocks(num_new)
        blocks.extend(new_blocks)
        return new_blocks

    def cache_blocks(self, request, num_tokens: int) -> None:
        pass


class CrossAttentionManager(ConstantPagesManager):
    """Encoder-output KV blocks (reference CrossAttentionManager,
    single_type_kv_cache_manager.py:606, Whisper): a fixed
    ``num_encoder_tokens`` rows per request allocated when the request
    first runs, independent of decoder growth (content keys on audio,
    not token prefix — never prefix-cached)."""

    def _num_pages(self) -> int:
        return cdiv(self.kv_cache_spec.num_encoder_tokens, self.block_size)


class MambaPagesManager(ConstantPagesManager):
    """Hybrid-model Mamba state pages (Jamba): ``num_state_pages``
    KV-shaped pages hold the layer's packed conv-history + SSM state."""

    def _num_pages(self) -> int:
        return self.kv_cache_spec.num_state_pages


def get_manager_for_kv_cache_spec(kv_cache_spec: KVCacheSpec,
                                  block_pool: BlockPool
                                  ) -> SingleTypeKVCacheManager:
    if isinstance(kv_cache_spec, SlidingWindowSpec):
        return SlidingWindowManager(kv_cache_spec, block_pool)
    if isinstance(kv_cache_spec, ChunkedLocalAttentionSpec):
        return ChunkedLocalAttentionManager(kv_cache_spec, block_pool)
    if isinstance(kv_cache_spec, CrossAttentionSpec):
        return CrossAttentionManager(kv_cache_spec, block_pool)
    if isinstance(kv_cache_spec, MambaPagesSpec):
        return MambaPagesManager(kv_cache_spec, block_pool)
    if isinstance(kv_cache_spec, MambaSpec):
        return MambaManager(kv_cache_spec, block_pool)
    if isinstance(kv_cache_spec, (FullAttentionSpec, MLAAttentionSpec)):
        # MLA latent blocks have full-attention lifetime semantics (every
        # token's row is live forever; prefix caching by content hash is
        # valid because the latent is a pure function of the prefix).
        return FullAttentionManager(kv_cache_spec, block_pool)
    raise NotImplementedError(f"No manager for {type(kv_cache_spec)}")
