"""Engine outputs → user-facing RequestOutputs.

Role of the reference's OutputProcessor (v1/engine/output_processor.py):
per-request incremental detokenization, stop-string detection (which aborts
the request in the engine), and RequestOutput assembly.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Optional

from vllm_trianglemix_tpu.core.sched_output import EngineCoreOutput
from vllm_trianglemix_tpu.engine.detokenizer import IncrementalDetokenizer
from vllm_trianglemix_tpu.metrics.stats import (
    IterationStats,
    RequestStateStats,
)
from vllm_trianglemix_tpu.outputs import CompletionOutput, RequestOutput
from vllm_trianglemix_tpu.request import Request


@dataclass
class RequestState:
    request: Request
    detok: Optional[IncrementalDetokenizer]
    new_token_ids: list[int] = field(default_factory=list)
    stats: RequestStateStats = field(default_factory=RequestStateStats)
    # per-token {token_id: logprob} dicts (sampled + top-k)
    logprobs: list = field(default_factory=list)
    cumulative_logprob: float = 0.0
    # prompt-token {token_id: logprob} dicts, index-aligned with
    # prompt_token_ids (index 0 is always None — no prefix to condition
    # on; reference prompt_logprobs format)
    prompt_logprobs: list = field(default_factory=list)


@dataclass
class ProcessedOutputs:
    request_outputs: list[RequestOutput]
    # requests that hit a stop string and must be aborted in the scheduler
    reqs_to_abort: list[str]


class OutputProcessor:

    def __init__(self, tokenizer=None) -> None:
        self.tokenizer = tokenizer
        self.states: dict[str, RequestState] = {}

    def add_request(self, request: Request) -> None:
        detok = None
        if self.tokenizer is not None and request.sampling_params.detokenize:
            detok = IncrementalDetokenizer(self.tokenizer,
                                           request.sampling_params,
                                           request.prompt_token_ids)
        state = RequestState(request, detok)
        state.stats.arrival_time = time.monotonic()
        self.states[request.request_id] = state

    def abort_requests(self, request_ids: list[str]) -> None:
        for rid in request_ids:
            self.states.pop(rid, None)

    def process_outputs(self, outputs: list[EngineCoreOutput],
                        iteration_stats: Optional[IterationStats] = None,
                        ) -> ProcessedOutputs:
        request_outputs: list[RequestOutput] = []
        reqs_to_abort: list[str] = []
        now = time.monotonic()
        for out in outputs:
            state = self.states.get(out.request_id)
            if state is None:
                continue
            if iteration_stats is not None:
                iteration_stats.update_from_output(
                    out, state.stats,
                    is_prefilling=state.stats.num_generation_tokens == 0,
                    prompt_len=len(state.request.prompt_token_ids), now=now)
            state.new_token_ids.extend(out.new_token_ids)
            if out.new_logprobs:
                for ids, lps in out.new_logprobs:
                    state.logprobs.append(dict(zip(ids, lps)))
                    state.cumulative_logprob += lps[0]
            if out.new_prompt_logprobs:
                first_idx, entries = out.new_prompt_logprobs
                # Preemption-by-recompute re-emits from the restart point:
                # truncate and re-extend so indices stay aligned.
                del state.prompt_logprobs[first_idx:]
                while len(state.prompt_logprobs) < first_idx:
                    state.prompt_logprobs.append(None)
                for tid, tlp, ids, lps in entries:
                    d = {int(tid): float(tlp)}
                    for i, lp_val in zip(ids, lps):
                        d.setdefault(int(i), float(lp_val))
                    state.prompt_logprobs.append(d)
            finish_reason = out.finish_reason
            stop_reason = out.stop_reason

            stop_str = None
            if state.detok is not None and out.new_token_ids:
                stop_str = state.detok.update(out.new_token_ids)
                if stop_str is not None and not out.finished:
                    reqs_to_abort.append(out.request_id)
                if stop_str is not None:
                    finish_reason = "stop"
                    stop_reason = stop_str

            finished = out.finished or stop_str is not None
            if finished or out.new_token_ids:
                # Emit cumulative outputs every step (streaming consumers
                # compute deltas; reference OutputProcessor does the same
                # via RequestOutputCollector deltas).
                req = state.request
                text = state.detok.output_text if state.detok else ""
                token_ids = (state.detok.output_token_ids if state.detok
                             else list(state.new_token_ids))
                request_outputs.append(
                    RequestOutput(
                        request_id=req.request_id,
                        prompt=req.prompt,
                        prompt_token_ids=req.prompt_token_ids,
                        outputs=[
                            CompletionOutput(
                                index=0,
                                text=text,
                                token_ids=list(token_ids),
                                cumulative_logprob=(
                                    state.cumulative_logprob
                                    if state.logprobs else None),
                                logprobs=(list(state.logprobs)
                                          if state.logprobs else None),
                                finish_reason=finish_reason if finished
                                else None,
                                stop_reason=stop_reason if finished else None,
                            )
                        ],
                        finished=finished,
                        pooled=(list(map(float, out.pooled_output))
                                if getattr(out, "pooled_output", None)
                                is not None else None),
                        prompt_logprobs=(list(state.prompt_logprobs)
                                         if state.prompt_logprobs
                                         else None),
                    ))
            if finished:
                if iteration_stats is not None:
                    iteration_stats.update_from_finished(
                        out, state.stats,
                        prompt_len=len(state.request.prompt_token_ids),
                        now=now)
                self.states.pop(out.request_id, None)
        return ProcessedOutputs(request_outputs, reqs_to_abort)

    def get_num_unfinished(self) -> int:
        return len(self.states)
