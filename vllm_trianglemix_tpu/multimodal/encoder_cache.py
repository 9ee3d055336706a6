"""Encoder-output cache accounting (scheduler side).

Role of the reference's EncoderCacheManager
(vllm/v1/core/encoder_cache_manager.py): the scheduler budgets vision-encoder
outputs in *encoder tokens* and decides, per step, which multimodal inputs
the worker must encode. Entries are keyed by content hash so identical
images across requests share one encoder output (reference: mm_hash
sharing). The worker mirrors the alloc/free decisions against its on-device
cache of projected embeddings.
"""

from __future__ import annotations

from vllm_trianglemix_tpu.request import Request


class EncoderCacheManager:

    def __init__(self, cache_size: int) -> None:
        # Budget in encoder output tokens (reference: encoder_cache_budget).
        self.cache_size = cache_size
        self.num_free_slots = cache_size
        # hash -> set of req_ids currently referencing the entry
        self.cached: dict[str, set[str]] = {}
        # hashes with zero referers, reclaimable LRU-ish (insertion order)
        self.freeable: dict[str, int] = {}

    def has_cache(self, request: Request, input_idx: int) -> bool:
        h = request.mm_items[input_idx].hash
        if h in self.cached:
            self.cached[h].add(request.request_id)
            # Revive a zero-ref entry: it never left `cached`, so its size
            # was never returned to num_free_slots — only drop it from the
            # reclaimable set (reference EncoderCacheManager
            # check_and_update_cache decrements num_freeable_slots only).
            self.freeable.pop(h, None)
            return True
        return False

    def can_allocate(self, request: Request, input_idx: int) -> bool:
        need = request.mm_items[input_idx].length
        return need <= self.num_free_slots + sum(self.freeable.values())

    def allocate(self, request: Request, input_idx: int) -> list[str]:
        """Claim budget for one input; returns content hashes evicted to
        make room (the worker drops them from its device cache)."""
        item = request.mm_items[input_idx]
        evicted: list[str] = []
        while self.num_free_slots < item.length and self.freeable:
            h, size = next(iter(self.freeable.items()))
            del self.freeable[h]
            del self.cached[h]
            self.num_free_slots += size
            evicted.append(h)
        assert self.num_free_slots >= item.length, "allocate() over budget"
        self.num_free_slots -= item.length
        self.cached[item.hash] = {request.request_id}
        return evicted

    def deallocate(self, request: Request, input_idx: int) -> None:
        """Fully undo an allocate() from the same scheduling pass: the
        encode request was rolled back, so the worker will never compute
        this output — the entry must not linger as a phantom cache hit."""
        item = request.mm_items[input_idx]
        if item.hash not in self.cached:
            return
        del self.cached[item.hash]
        self.freeable.pop(item.hash, None)
        self.num_free_slots += item.length

    def free_request(self, request: Request) -> None:
        """Drop this request's references; zero-ref entries become
        freeable (stay cached until evicted — later identical images can
        still hit)."""
        for item in getattr(request, "mm_items", None) or []:
            refs = self.cached.get(item.hash)
            if refs is None:
                continue
            refs.discard(request.request_id)
            if not refs and item.hash not in self.freeable:
                self.freeable[item.hash] = item.length

    def release_input(self, request: Request, input_idx: int) -> None:
        """An input's span is fully computed into KV for this request —
        drop the reference (reference: free_encoder_input after the last
        placeholder token is scheduled)."""
        item = request.mm_items[input_idx]
        refs = self.cached.get(item.hash)
        if refs is None:
            return
        refs.discard(request.request_id)
        if not refs and item.hash not in self.freeable:
            self.freeable[item.hash] = item.length
