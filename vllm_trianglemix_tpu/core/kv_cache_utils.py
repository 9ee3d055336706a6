"""Content-addressed KV block hashing + free-block queue.

Semantics mirrored from the reference's ``vllm/v1/core/kv_cache_utils.py``:
- blocks are hashed by (parent_hash, tokens_in_block) so a hash identifies
  the whole prefix up to and including the block (reference :517-622);
- the free list is a doubly-linked queue that evicts least-recently-freed
  first and supports O(1) removal from the middle when a cached block is
  reused (reference FreeKVCacheBlockQueue :216-416).

Implementation is original (dataclass blocks + list-based linkage).
"""

from __future__ import annotations

import hashlib
import pickle
from dataclasses import dataclass, field
from typing import Any, NamedTuple, Optional


class BlockHash(NamedTuple):
    """Hash of one full KV block: parent-chained digest + the raw tokens
    (kept to guard against digest collisions, like the reference)."""

    hash_value: bytes
    token_ids: tuple[int, ...]


# Root of every hash chain. Configurable-at-import like the reference's
# NONE_HASH (seeded) — a fixed seed keeps prefix caching deterministic
# across engine processes.
NONE_HASH = b"\x00" * 16


def hash_block_tokens(
    parent_hash: Optional[bytes],
    token_ids: tuple[int, ...] | list[int],
    extra_keys: Optional[tuple[Any, ...]] = None,
) -> BlockHash:
    """Chain-hash one block of tokens (reference kv_cache_utils.py:517-560).

    The digest itself comes from the native (C++) chained hash with an
    identical pure-Python fallback (utils/native.py); MM/LoRA extra keys
    fold into the parent digest.
    """
    from vllm_trianglemix_tpu.utils.native import hash_blocks

    parent = parent_hash if parent_hash is not None else NONE_HASH
    if extra_keys:
        payload = pickle.dumps(extra_keys,
                               protocol=pickle.HIGHEST_PROTOCOL)
        parent = hashlib.blake2b(parent + payload,
                                 digest_size=16).digest()
    digest = hash_blocks(list(token_ids), len(token_ids), parent)[0]
    return BlockHash(digest, tuple(token_ids))


def hash_request_tokens(block_size: int,
                        token_ids: list[int],
                        start_block: int = 0,
                        parent_hash: Optional[bytes] = None,
                        salt: Optional[str] = None,
                        extra_keys_at: Optional[dict[int, tuple]] = None,
                        ) -> list[BlockHash]:
    """Hash all *full* blocks of a token list, optionally resuming from an
    existing chain (reference kv_cache_utils.py:562-622). One native call
    hashes the whole span. ``salt`` (e.g. the LoRA adapter name) seeds the
    chain root so differently-adapted requests never share cache entries.
    ``extra_keys_at`` maps a block index to extra keys (e.g. multimodal
    content hashes, multimodal.mm_extra_keys) folded into that block's
    parent digest — chain propagation covers every later block.
    """
    from vllm_trianglemix_tpu.utils.native import hash_blocks

    n_full = len(token_ids) // block_size
    if n_full <= start_block:
        return []
    parent = parent_hash if parent_hash is not None else NONE_HASH
    if parent_hash is None and salt:
        parent = hashlib.blake2b(NONE_HASH + salt.encode(),
                                 digest_size=16).digest()

    out: list[BlockHash] = []
    # Split the native batched call at blocks that fold extra keys.
    splits = sorted(b for b in (extra_keys_at or {})
                    if start_block <= b < n_full)
    seg_start = start_block
    for b in splits + [n_full]:
        if b > seg_start:
            span = token_ids[seg_start * block_size:b * block_size]
            digests = hash_blocks(span, block_size, parent)
            out.extend(
                BlockHash(d, tuple(
                    token_ids[bb * block_size:(bb + 1) * block_size]))
                for d, bb in zip(digests, range(seg_start, b)))
            parent = out[-1].hash_value
            seg_start = b
        if b < n_full and extra_keys_at and b in extra_keys_at:
            payload = pickle.dumps(extra_keys_at[b],
                                   protocol=pickle.HIGHEST_PROTOCOL)
            parent = hashlib.blake2b(parent + payload,
                                     digest_size=16).digest()
    return out


@dataclass
class KVCacheBlock:
    """One page of KV cache (all layers share the block id space per group)."""

    block_id: int
    ref_cnt: int = 0
    block_hash: Optional[BlockHash] = None
    # Doubly-linked free-queue pointers.
    prev_free_block: Optional["KVCacheBlock"] = field(default=None, repr=False)
    next_free_block: Optional["KVCacheBlock"] = field(default=None, repr=False)
    # True only for the shared null block used to pad skipped regions.
    is_null: bool = False

    def incr_ref(self) -> None:
        self.ref_cnt += 1

    def decr_ref(self) -> None:
        self.ref_cnt -= 1

    def reset_hash(self) -> None:
        self.block_hash = None


class FreeKVCacheBlockQueue:
    """LRU eviction order over free blocks with O(1) arbitrary removal.

    Blocks are appended when freed (least-recently-freed at the head gets
    evicted first); a prefix-cache hit removes a block from anywhere in the
    queue (reference kv_cache_utils.py:216-416).
    """

    def __init__(self, blocks: list[KVCacheBlock]) -> None:
        self.num_free_blocks = 0
        # Sentinel head/tail simplify edge cases.
        self._head = KVCacheBlock(block_id=-1)
        self._tail = KVCacheBlock(block_id=-2)
        self._head.next_free_block = self._tail
        self._tail.prev_free_block = self._head
        for b in blocks:
            self.append(b)

    def popleft(self) -> KVCacheBlock:
        block = self._head.next_free_block
        if block is self._tail:
            raise ValueError("No free blocks available")
        self.remove(block)
        return block

    def remove(self, block: KVCacheBlock) -> None:
        if block.prev_free_block is None or block.next_free_block is None:
            raise ValueError(f"Block {block.block_id} is not in the free queue")
        block.prev_free_block.next_free_block = block.next_free_block
        block.next_free_block.prev_free_block = block.prev_free_block
        block.prev_free_block = None
        block.next_free_block = None
        self.num_free_blocks -= 1

    def append(self, block: KVCacheBlock) -> None:
        last = self._tail.prev_free_block
        last.next_free_block = block
        block.prev_free_block = last
        block.next_free_block = self._tail
        self._tail.prev_free_block = block
        self.num_free_blocks += 1

    def get_all_free_blocks(self) -> list[KVCacheBlock]:
        out = []
        cur = self._head.next_free_block
        while cur is not self._tail:
            out.append(cur)
            cur = cur.next_free_block
        return out
