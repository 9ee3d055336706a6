"""Factories for device-free core tests (pattern from reference
tests/v1/core/utils.py:25-122: real scheduler, fake KV config, no model)."""

from __future__ import annotations

import itertools

from vllm_trianglemix_tpu.config import CacheConfig, SchedulerConfig
from vllm_trianglemix_tpu.core.kv_cache_interface import (
    FullAttentionSpec,
    KVCacheConfig,
    KVCacheGroupSpec,
)
from vllm_trianglemix_tpu.core.scheduler import Scheduler
from vllm_trianglemix_tpu.request import Request
from vllm_trianglemix_tpu.sampling_params import SamplingParams

EOS_TOKEN_ID = 50256
_counter = itertools.count()


def make_kv_cache_config(block_size: int = 16,
                         num_blocks: int = 128) -> KVCacheConfig:
    spec = FullAttentionSpec(block_size=block_size, num_kv_heads=2,
                             head_size=64, dtype_bytes=2)
    return KVCacheConfig(
        num_blocks=num_blocks,
        kv_cache_groups=(KVCacheGroupSpec(("layer.0",), spec),),
    )


def create_scheduler(
    max_num_seqs: int = 16,
    max_num_batched_tokens: int = 8192,
    block_size: int = 16,
    num_blocks: int = 128,
    max_model_len: int = 1024,
    enable_prefix_caching: bool = True,
    policy: str = "fcfs",
    long_prefill_token_threshold: int = 0,
    async_scheduling: bool = False,
) -> Scheduler:
    return Scheduler(
        scheduler_config=SchedulerConfig(
            max_num_seqs=max_num_seqs,
            max_num_batched_tokens=max_num_batched_tokens,
            policy=policy,
            long_prefill_token_threshold=long_prefill_token_threshold,
            async_scheduling=async_scheduling,
        ),
        cache_config=CacheConfig(
            block_size=block_size,
            enable_prefix_caching=enable_prefix_caching,
        ),
        kv_cache_config=make_kv_cache_config(block_size, num_blocks),
        max_model_len=max_model_len,
    )


def create_requests(
    num_requests: int,
    num_tokens: int = 10,
    max_tokens: int = 16,
    same_prompt: bool = False,
    priority: int = 0,
) -> list[Request]:
    out = []
    for i in range(num_requests):
        base = 0 if same_prompt else i * 1000
        out.append(
            Request(
                request_id=f"req-{next(_counter)}",
                prompt_token_ids=[base + t for t in range(num_tokens)],
                sampling_params=SamplingParams(max_tokens=max_tokens),
                eos_token_id=EOS_TOKEN_ID,
                arrival_time=float(i),
                priority=priority,
            ))
    return out
