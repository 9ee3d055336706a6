"""Declarative per-layer KV cache specs.

Mirror of the reference's ``vllm/v1/kv_cache_interface.py``: each attention
layer declares what kind of KV storage it needs; the engine groups layers
with identical specs and sizes the pool from available HBM.
"""

from __future__ import annotations

from dataclasses import dataclass
from math import ceil


@dataclass(frozen=True)
class KVCacheSpec:
    """Base spec: geometry of one layer's KV cache."""

    block_size: int
    num_kv_heads: int
    head_size: int
    dtype_bytes: int  # bytes per element of the stored K/V (2 bf16, 1 fp8)

    @property
    def page_size_bytes(self) -> int:
        # K and V per token per layer.
        return (2 * self.block_size * self.num_kv_heads * self.head_size
                * self.dtype_bytes)

    def max_memory_usage_bytes(self, max_model_len: int) -> int:
        return ceil(max_model_len / self.block_size) * self.page_size_bytes


@dataclass(frozen=True)
class FullAttentionSpec(KVCacheSpec):
    pass


@dataclass(frozen=True)
class MLAAttentionSpec(KVCacheSpec):
    """Latent-cache MLA (reference MLAAttentionSpec,
    vllm/v1/kv_cache_interface.py:142): ONE row per token of width
    head_size = kv_lora_rank + qk_rope_head_dim — no separate K and V."""

    @property
    def page_size_bytes(self) -> int:
        return (self.block_size * self.num_kv_heads * self.head_size
                * self.dtype_bytes)


@dataclass(frozen=True)
class MambaSpec(KVCacheSpec):
    """Constant-size per-request state (reference MambaSpec,
    vllm/v1/kv_cache_interface.py:218): block_size is the whole model
    length so every request owns exactly ONE block, whose storage is a
    single state row of head_size elements per layer."""

    @property
    def page_size_bytes(self) -> int:
        return self.num_kv_heads * self.head_size * self.dtype_bytes

    def max_memory_usage_bytes(self, max_model_len: int) -> int:
        return self.page_size_bytes


@dataclass(frozen=True)
class ChunkedLocalAttentionSpec(KVCacheSpec):
    """Chunked-local attention (reference ChunkedLocalAttentionSpec,
    vllm/v1/kv_cache_interface.py:174, Llama-4 style): token p attends
    within its aligned chunk [floor(p/C)*C, p], so at most one chunk of
    KV is ever live per request."""

    attention_chunk_size: int = 0

    def max_memory_usage_bytes(self, max_model_len: int) -> int:
        num_tokens = min(self.attention_chunk_size + self.block_size,
                         max_model_len)
        return ceil(num_tokens / self.block_size) * self.page_size_bytes


@dataclass(frozen=True)
class SlidingWindowSpec(KVCacheSpec):
    sliding_window: int = 0

    def max_memory_usage_bytes(self, max_model_len: int) -> int:
        num_tokens = min(self.sliding_window + self.block_size, max_model_len)
        return ceil(num_tokens / self.block_size) * self.page_size_bytes


@dataclass(frozen=True)
class MambaPagesSpec(KVCacheSpec):
    """Mamba state rows packed into standard KV-shaped pages, for HYBRID
    attention+SSM models (Jamba) where the state must share one
    (block_size-uniform) pool with full-attention groups: each request
    owns ``num_state_pages`` pages of its layer's pool for its whole
    lifetime (ceil(state_row_width / page_elements)). Pure-SSM models
    keep the dedicated one-row-per-request MambaSpec layout instead."""

    num_state_pages: int = 1

    def max_memory_usage_bytes(self, max_model_len: int) -> int:
        return self.num_state_pages * self.page_size_bytes


@dataclass(frozen=True)
class CrossAttentionSpec(KVCacheSpec):
    """Encoder-decoder cross-attention KV (reference CrossAttentionSpec,
    vllm/v1/kv_cache_interface.py:251, Whisper): per-layer K/V projected
    from the ENCODER output — a fixed ``num_encoder_tokens`` rows per
    request, written once when the request starts and never grown."""

    num_encoder_tokens: int = 0

    def max_memory_usage_bytes(self, max_model_len: int) -> int:
        return (ceil(self.num_encoder_tokens / self.block_size)
                * self.page_size_bytes)


@dataclass(frozen=True)
class KVCacheGroupSpec:
    """A group of layers sharing one spec (and one block-id space)."""

    layer_names: tuple[str, ...]
    kv_cache_spec: KVCacheSpec


@dataclass(frozen=True)
class KVCacheConfig:
    num_blocks: int
    kv_cache_groups: tuple[KVCacheGroupSpec, ...]
