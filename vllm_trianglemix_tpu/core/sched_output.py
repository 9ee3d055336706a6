"""Scheduler ↔ model-runner interface types.

Mirror of the reference's ``vllm/v1/core/sched/output.py`` (SchedulerOutput,
NewRequestData, CachedRequestData) and ``vllm/v1/outputs.py``
(ModelRunnerOutput), trimmed to the engine's current feature set.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

from vllm_trianglemix_tpu.request import Request
from vllm_trianglemix_tpu.sampling_params import SamplingParams


@dataclass
class NewRequestData:
    """Everything the worker needs to admit a request it has never seen."""

    req_id: str
    prompt_token_ids: list[int]
    block_ids: list[int]
    num_computed_tokens: int
    sampling_params: SamplingParams
    lora_name: Optional[str] = None
    pooling_params: object = None
    # Multimodal inputs (multimodal.MultiModalItem list; pixel tensors ride
    # to the worker here, like the reference's mm_kwargs on NewRequestData).
    mm_items: Optional[list] = None

    @classmethod
    def from_request(cls, request: Request,
                     block_ids: list[int]) -> "NewRequestData":
        return cls(
            req_id=request.request_id,
            prompt_token_ids=request.prompt_token_ids,
            block_ids=block_ids,
            num_computed_tokens=request.num_computed_tokens,
            sampling_params=request.sampling_params,
            lora_name=request.lora_name,
            pooling_params=request.pooling_params,
            mm_items=request.mm_items or None,
        )


@dataclass
class CachedRequestData:
    """Delta for requests the worker already tracks."""

    req_ids: list[str] = field(default_factory=list)
    # Newly allocated block ids this step, parallel to req_ids.
    new_block_ids: list[Optional[list[int]]] = field(default_factory=list)
    num_computed_tokens: list[int] = field(default_factory=list)
    # True if the request was preempted and restarts from 0 (resumed).
    resumed_from_preemption: list[bool] = field(default_factory=list)
    # For resumed requests: all token ids (prompt + generated so far).
    all_token_ids: list[Optional[list[int]]] = field(default_factory=list)

    @property
    def num_reqs(self) -> int:
        return len(self.req_ids)


@dataclass
class SchedulerOutput:
    scheduled_new_reqs: list[NewRequestData] = field(default_factory=list)
    scheduled_cached_reqs: CachedRequestData = field(
        default_factory=CachedRequestData)
    # req_id -> number of tokens to compute this step.
    num_scheduled_tokens: dict[str, int] = field(default_factory=dict)
    total_num_scheduled_tokens: int = 0
    finished_req_ids: set[str] = field(default_factory=set)
    # Multi-step decode: req_id -> number of autoregressive decode steps the
    # worker should run device-side before returning (1 = normal). Set only
    # when the whole batch is in decode; KV slots for all steps are
    # pre-allocated by the scheduler.
    num_decode_steps: dict[str, int] = field(default_factory=dict)
    # Structured decoding: allowed-token mask rows for the scheduled
    # requests (bool[num_reqs, vocab]), None when unconstrained
    # (reference: grammar bitmask carried via SchedulerOutput).
    grammar_mask: Optional[object] = None
    # Speculative decoding: req_id -> draft token ids verified this step
    # (reference scheduled_spec_decode_tokens). The drafts are counted in
    # num_scheduled_tokens; the runner splices them after the real token.
    scheduled_spec_tokens: dict[str, list[int]] = field(default_factory=dict)
    # KV connector ops (reference KVConnector worker role): blocks to pull
    # from / push to the external store this step, as
    # (block_hash_hex, block_id) pairs.
    kv_load_ops: list = field(default_factory=list)
    kv_save_ops: list = field(default_factory=list)
    # Async scheduling: req_ids that sample this step (their output tokens
    # are placeholders until the step's results land). None = sync mode
    # (the worker infers sampling from its own token counts).
    sampling_req_ids: Optional[set[str]] = None
    # Multimodal: req_id -> mm input indices the worker must encode this
    # step (reference scheduled_encoder_inputs), and encoder-cache entries
    # (content hashes) evicted by the scheduler's EncoderCacheManager that
    # the worker must drop from its device cache.
    scheduled_encoder_inputs: dict[str, list[int]] = field(
        default_factory=dict)
    freed_encoder_hashes: list[str] = field(default_factory=list)

    @property
    def max_decode_steps(self) -> int:
        return max(self.num_decode_steps.values(), default=1)

    @property
    def is_empty(self) -> bool:
        return self.total_num_scheduled_tokens == 0


@dataclass
class ModelRunnerOutput:
    """What execute_model hands back to the scheduler."""

    # req_ids in the worker's batch order.
    req_ids: list[str] = field(default_factory=list)
    # Per request: sampled token ids (one for decode; empty if the request's
    # prefill is still mid-chunk and no token was sampled).
    sampled_token_ids: list[list[int]] = field(default_factory=list)
    # Optional per-request logprobs: (token_ids, logprobs) of top-k + sampled.
    logprobs: Optional[list] = None
    # Embedding requests: req_id -> pooled (and normalized) vector.
    pooled: Optional[dict] = None
    # EAGLE draft-model proposals for the NEXT step: req_id -> draft ids
    # (reference spec_token_ids flow via update_from_output).
    draft_tokens: Optional[dict] = None
    # Prompt logprobs for this step's prompt chunks: req_id ->
    # (first_token_index, [(target_id, target_lp, topk_ids, topk_lps)]).
    prompt_logprobs: Optional[dict] = None


EMPTY_MODEL_RUNNER_OUTPUT = ModelRunnerOutput()


@dataclass
class EngineCoreOutput:
    """Per-request engine-step result (subset of reference EngineCoreOutput)."""

    request_id: str
    new_token_ids: list[int]
    finished: bool = False
    finish_reason: Optional[str] = None
    stop_reason: Optional[int | str] = None
    # Embedding requests: the pooled vector (numpy), set on finish.
    pooled_output: Optional[object] = None
    # Per accepted token: ([sampled_id, topk ids...], [logprobs...]).
    new_logprobs: Optional[list] = None
    # Prompt logprobs chunk: (first_token_index, [(target_id, target_lp,
    # topk_ids, topk_lps), ...]) — token index i's entry is the logprob
    # of prompt token i given tokens < i (index 0 never has one).
    new_prompt_logprobs: Optional[tuple] = None


@dataclass
class SchedulerStats:
    num_running_reqs: int = 0
    num_waiting_reqs: int = 0
    kv_cache_usage: float = 0.0
    prefix_cache_queries: int = 0
    prefix_cache_hits: int = 0
    # spec decode (reference spec_decode/metrics.py): cumulative drafts
    # scheduled vs accepted
    spec_num_drafts: int = 0
    spec_num_accepted: int = 0
