"""Per-iteration and per-request statistics.

Mirror of the reference's vllm/v1/metrics/stats.py: SchedulerStats flows
from the scheduler (queue depths, KV usage, prefix-cache hit rate) and
IterationStats aggregates per-step token counts and request timings (TTFT,
TPOT, e2e) for the loggers.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Optional


@dataclass
class RequestStateStats:
    """Per-request timing state tracked by the frontend."""

    arrival_time: float = 0.0
    queued_time: float = 0.0
    scheduled_time: float = 0.0
    first_token_time: float = 0.0
    last_token_time: float = 0.0
    num_generation_tokens: int = 0


@dataclass
class FinishedRequestStats:
    finish_reason: str = ""
    e2e_latency: float = 0.0
    ttft: float = 0.0
    num_prompt_tokens: int = 0
    num_generation_tokens: int = 0
    queued_time: float = 0.0
    inference_time: float = 0.0
    mean_time_per_output_token: float = 0.0


@dataclass
class IterationStats:
    """One engine step's aggregate (reference stats.py IterationStats)."""

    num_generation_tokens: int = 0
    num_prompt_tokens: int = 0
    num_preempted_reqs: int = 0
    finished_requests: list[FinishedRequestStats] = field(
        default_factory=list)
    time_to_first_tokens: list[float] = field(default_factory=list)
    time_per_output_tokens: list[float] = field(default_factory=list)

    def update_from_output(self, out, state: RequestStateStats,
                           is_prefilling: bool, prompt_len: int,
                           now: Optional[float] = None) -> None:
        now = now or time.monotonic()
        n_new = len(out.new_token_ids)
        self.num_generation_tokens += n_new
        if is_prefilling and n_new > 0:
            self.num_prompt_tokens += prompt_len
            ttft = now - state.arrival_time
            self.time_to_first_tokens.append(ttft)
            state.first_token_time = now
        elif n_new > 0 and state.last_token_time > 0:
            self.time_per_output_tokens.append(
                (now - state.last_token_time) / n_new)
        if n_new > 0:
            state.last_token_time = now
            state.num_generation_tokens += n_new

    def update_from_finished(self, out, state: RequestStateStats,
                             prompt_len: int,
                             now: Optional[float] = None) -> None:
        now = now or time.monotonic()
        e2e = now - state.arrival_time
        n_gen = max(1, state.num_generation_tokens)
        self.finished_requests.append(FinishedRequestStats(
            finish_reason=out.finish_reason or "",
            e2e_latency=e2e,
            ttft=(state.first_token_time - state.arrival_time
                  if state.first_token_time else e2e),
            num_prompt_tokens=prompt_len,
            num_generation_tokens=state.num_generation_tokens,
            queued_time=state.scheduled_time - state.arrival_time
            if state.scheduled_time else 0.0,
            inference_time=now - (state.scheduled_time
                                  or state.arrival_time),
            mean_time_per_output_token=(now - (state.first_token_time
                                               or state.arrival_time))
            / n_gen,
        ))
