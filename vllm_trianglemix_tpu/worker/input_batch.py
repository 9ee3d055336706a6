"""Host-side persistent per-request state for the model runner.

Role of the reference's InputBatch/CachedRequestState
(vllm/v1/worker/gpu_input_batch.py, tpu_input_batch.py): the worker keeps
its own view of every live request (tokens, block table, progress) and
diffs the scheduler's output into it each step (_update_states pattern,
tpu_model_runner.py:333).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from vllm_trianglemix_tpu.core.sched_output import SchedulerOutput
from vllm_trianglemix_tpu.sampling_params import SamplingParams


@dataclass
class CachedRequestState:
    req_id: str
    token_ids: list[int]            # prompt + accepted output tokens
    prompt_len: int
    block_ids: list[int]
    num_computed_tokens: int
    sampling_params: SamplingParams
    lora_name: str = None
    pooling_params: object = None
    # multimodal items (pixel tensors + placeholder spans), prompt order
    mm_items: list = None
    # monotonically increasing per-request step counter (sampling seeds)
    step_counter: int = 0

    @property
    def num_tokens(self) -> int:
        return len(self.token_ids)


class InputBatch:
    """req_id → CachedRequestState, kept in sync with the scheduler."""

    def __init__(self) -> None:
        self.requests: dict[str, CachedRequestState] = {}

    def update_from_scheduler_output(self, so: SchedulerOutput) -> None:
        for req_id in so.finished_req_ids:
            self.requests.pop(req_id, None)

        for new_req in so.scheduled_new_reqs:
            self.requests[new_req.req_id] = CachedRequestState(
                req_id=new_req.req_id,
                token_ids=list(new_req.prompt_token_ids),
                prompt_len=len(new_req.prompt_token_ids),
                block_ids=list(new_req.block_ids),
                num_computed_tokens=new_req.num_computed_tokens,
                sampling_params=new_req.sampling_params,
                lora_name=new_req.lora_name,
                pooling_params=new_req.pooling_params,
                mm_items=new_req.mm_items,
            )

        cached = so.scheduled_cached_reqs
        for i, req_id in enumerate(cached.req_ids):
            state = self.requests[req_id]
            if cached.resumed_from_preemption[i]:
                # Restart from scratch: scheduler sends the full token list
                # and a full new block table.
                state.token_ids = list(cached.all_token_ids[i])
                state.block_ids = list(cached.new_block_ids[i])
            else:
                new_ids = cached.new_block_ids[i]
                if new_ids and isinstance(new_ids[0], list):
                    # hybrid KV groups: per-group block lists
                    for g, ids in zip(state.block_ids, new_ids):
                        g.extend(ids)
                elif new_ids:
                    state.block_ids.extend(new_ids)
            state.num_computed_tokens = cached.num_computed_tokens[i]

    def append_token(self, req_id: str, token_id: int) -> None:
        state = self.requests.get(req_id)
        if state is not None:
            state.token_ids.append(token_id)

    def get(self, req_id: str) -> CachedRequestState:
        return self.requests[req_id]

    def __len__(self) -> int:
        return len(self.requests)
