"""Multimodal inputs: typed image items attached to a request.

Role of the reference's ``vllm/multimodal/`` registry + input types
(MultiModalKwargs / PlaceholderRange): each image in a prompt becomes one
:class:`MultiModalItem` carrying its pixel tensor, the placeholder span it
occupies in the token sequence, and a content hash used for encoder-cache
keying and prefix-cache block hashing (reference kv_cache_utils.py MM extra
keys).
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass, field

import numpy as np


@dataclass
class MultiModalItem:
    """One encoded-media item (currently: images).

    ``offset``/``length`` delimit the placeholder span in the request's
    token ids (reference PlaceholderRange, vllm/multimodal/inputs.py).
    ``data`` is the preprocessed pixel tensor [3, H, W] float32. ``hash``
    is a content digest: identical images hash identically, so encoder
    outputs and KV blocks are shareable across requests.
    """

    offset: int
    length: int
    data: np.ndarray = field(repr=False)
    hash: str = ""
    # "image" | "video" (one temporal slice of real frames,
    # [tps, 3, S, S]) | "audio" — selects the encoder the runner calls.
    modality: str = "image"

    def __post_init__(self) -> None:
        if not self.hash:
            self.hash = content_hash(self.data)

    @property
    def span(self) -> tuple[int, int]:
        return (self.offset, self.offset + self.length)

    def overlaps(self, start: int, end: int) -> bool:
        return self.offset < end and start < self.offset + self.length


def content_hash(data: np.ndarray) -> str:
    h = hashlib.blake2b(digest_size=16)
    h.update(str(data.shape).encode())
    h.update(np.ascontiguousarray(data).tobytes())
    return h.hexdigest()


def mm_extra_keys(mm_items: list[MultiModalItem] | None,
                  block_size: int) -> dict[int, tuple]:
    """Per-block extra hash keys for MM-safe prefix caching.

    Because block hashes chain (each digest covers the whole prefix),
    folding an image's content hash into the FIRST block that contains any
    of its placeholder tokens is sufficient: two prompts with identical
    token ids but different images diverge at that block and every block
    after it (reference: per-block extra keys, kv_cache_utils.py:517-622 —
    chain propagation makes the first-overlap fold equivalent).
    """
    if not mm_items:
        return {}
    out: dict[int, tuple] = {}
    for item in mm_items:
        b = item.offset // block_size
        out.setdefault(b, ())
        out[b] = out[b] + (item.hash,)
    return out
