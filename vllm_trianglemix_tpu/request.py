"""Per-request engine state machine.

Mirror of the reference's ``vllm/v1/request.py`` (Request/RequestStatus):
a request tracks prompt + generated tokens, how many tokens have been
computed into the KV cache, and its scheduling status.
"""

from __future__ import annotations

import enum
import time
from typing import TYPE_CHECKING, Any, Optional

from vllm_trianglemix_tpu.sampling_params import SamplingParams

if TYPE_CHECKING:
    from vllm_trianglemix_tpu.core.kv_cache_utils import BlockHash


class RequestStatus(enum.IntEnum):
    WAITING = 0
    RUNNING = 1
    PREEMPTED = 2
    # All FINISHED_* states must sort after RUNNING.
    FINISHED_STOPPED = 3
    FINISHED_LENGTH_CAPPED = 4
    FINISHED_ABORTED = 5

    @staticmethod
    def is_finished(status: "RequestStatus") -> bool:
        return status >= RequestStatus.FINISHED_STOPPED


FINISH_REASON = {
    RequestStatus.FINISHED_STOPPED: "stop",
    RequestStatus.FINISHED_LENGTH_CAPPED: "length",
    RequestStatus.FINISHED_ABORTED: "abort",
}


class Request:

    def __init__(
        self,
        request_id: str,
        prompt_token_ids: list[int],
        sampling_params: SamplingParams,
        eos_token_id: Optional[int] = None,
        arrival_time: Optional[float] = None,
        priority: int = 0,
        prompt: Optional[str] = None,
        lora_name: Optional[str] = None,
        pooling_params=None,
        mm_items=None,
    ) -> None:
        self.request_id = request_id
        self.lora_name = lora_name
        # Multimodal inputs (multimodal.MultiModalItem list), prompt order.
        self.mm_items = mm_items or []
        # Non-None marks an embedding request (finishes at end of prefill,
        # returns a pooled vector instead of sampling).
        self.pooling_params = pooling_params
        self.prompt = prompt
        self.prompt_token_ids = list(prompt_token_ids)
        self.num_prompt_tokens = len(self.prompt_token_ids)
        if self.num_prompt_tokens == 0:
            raise ValueError("prompt must be non-empty")
        self.sampling_params = sampling_params
        self.eos_token_id = eos_token_id
        self.arrival_time = arrival_time if arrival_time is not None else time.time()
        self.priority = priority

        self.status = RequestStatus.WAITING
        self.stop_reason: Optional[Any] = None

        self._output_token_ids: list[int] = []
        self._all_token_ids: list[int] = list(self.prompt_token_ids)
        # Tokens whose KV is already in the cache (prefix hits + computed).
        self.num_computed_tokens = 0
        # Prefix-cache hit length at schedule time (stats).
        self.num_cached_tokens = -1
        # Content-addressed hashes of this request's full blocks
        # (kv_cache_utils.hash_request_tokens), grown lazily.
        self.block_hashes: list["BlockHash"] = []
        # Number of preemptions (stats).
        self.num_preemptions = 0
        # Spec-decode placeholder ids for future rounds.
        self.spec_token_ids: list[int] = []
        # Async scheduling (reference async_scheduler.py:14): number of
        # output tokens sampled by in-flight steps whose values have not
        # reached the host yet. Scheduling length = num_tokens + this.
        self.num_output_placeholders = 0

        params = sampling_params
        if params.max_tokens is None:
            params.max_tokens = 2**31
        if (self.eos_token_id is not None and not params.ignore_eos):
            params.all_stop_token_ids.add(self.eos_token_id)

    @property
    def cache_salt(self) -> Optional[str]:
        """Prefix-cache isolation key: requests under different LoRA
        adapters must never share cached KV blocks (reference: LoRA extra
        keys in block hashing, kv_cache_utils.py:517-622)."""
        return self.lora_name

    def mm_extra_keys(self, block_size: int) -> Optional[dict]:
        """Per-block extra hash keys for multimodal prefix caching (None
        for text-only requests)."""
        if not self.mm_items:
            return None
        from vllm_trianglemix_tpu.multimodal import mm_extra_keys

        return mm_extra_keys(self.mm_items, block_size)

    # --- token accounting -------------------------------------------------
    @property
    def output_token_ids(self) -> list[int]:
        return self._output_token_ids

    @property
    def all_token_ids(self) -> list[int]:
        return self._all_token_ids

    @property
    def num_tokens(self) -> int:
        return len(self._all_token_ids)

    @property
    def num_output_tokens(self) -> int:
        return len(self._output_token_ids)

    def append_output_token_ids(self, token_ids: int | list[int]) -> None:
        if isinstance(token_ids, int):
            token_ids = [token_ids]
        self._output_token_ids.extend(token_ids)
        self._all_token_ids.extend(token_ids)

    @property
    def is_finished(self) -> bool:
        return RequestStatus.is_finished(self.status)

    def get_finished_reason(self) -> Optional[str]:
        return FINISH_REASON.get(self.status)

    def __repr__(self) -> str:
        return (f"Request(id={self.request_id}, status={self.status.name}, "
                f"prompt={self.num_prompt_tokens}t, "
                f"out={self.num_output_tokens}t, "
                f"computed={self.num_computed_tokens}t)")
