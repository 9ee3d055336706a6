"""Token-budget continuous-batching scheduler.

Mirror of the reference's ``vllm/v1/core/sched/scheduler.py`` algorithm:
there are no prefill/decode phases — every scheduled request simply advances
``num_computed_tokens`` toward ``num_tokens`` under a shared per-step token
budget, which yields chunked prefill and mixed prefill/decode batches for
free. Preemption is by recompute: the victim's blocks are freed and it is
requeued with num_computed_tokens=0 (reference scheduler.py:254-292).
"""

from __future__ import annotations

from typing import Optional

from vllm_trianglemix_tpu.config import CacheConfig, SchedulerConfig
from vllm_trianglemix_tpu.core.kv_cache_interface import KVCacheConfig
from vllm_trianglemix_tpu.core.kv_cache_manager import KVCacheManager
from vllm_trianglemix_tpu.core.request_queue import create_request_queue
from vllm_trianglemix_tpu.core.sched_output import (
    CachedRequestData,
    EngineCoreOutput,
    ModelRunnerOutput,
    NewRequestData,
    SchedulerOutput,
    SchedulerStats,
)
from vllm_trianglemix_tpu.logger import init_logger
from vllm_trianglemix_tpu.request import Request, RequestStatus

logger = init_logger(__name__)


class Scheduler:

    def __init__(
        self,
        scheduler_config: SchedulerConfig,
        cache_config: CacheConfig,
        kv_cache_config: KVCacheConfig,
        max_model_len: int,
        speculative_config=None,
        kv_connector=None,
    ) -> None:
        self.scheduler_config = scheduler_config
        self.kv_connector = kv_connector
        self.proposer = None
        self.spec_method = None
        self.num_spec_tokens = 0
        # Draft scheduling vs acceptance counters (reference
        # spec_decode/metrics.py role).
        self.spec_stats = {"num_drafts": 0, "num_accepted": 0}
        self.spec_tree = False
        if speculative_config is not None and speculative_config.enabled:
            self.spec_method = speculative_config.method
            self.num_spec_tokens = speculative_config.num_speculative_tokens
            # Star-chain tree drafts (spec_decode/eagle.py tree mode):
            # trees verify whole or not at all, greedy requests only, and
            # draft rows never write KV (accepted tokens recompute as
            # real rows next step).
            self.spec_tree = speculative_config.tree_enabled
            if self.spec_tree:
                self.num_spec_tokens = speculative_config.num_tree_tokens
            if speculative_config.method == "ngram":
                from vllm_trianglemix_tpu.spec_decode.ngram_proposer import (
                    NgramProposer,
                )

                self.proposer = NgramProposer(speculative_config)
            # "eagle": drafts arrive device-proposed on the previous
            # step's ModelRunnerOutput (request.spec_token_ids).
        self.max_num_seqs = scheduler_config.max_num_seqs
        self.max_num_batched_tokens = scheduler_config.max_num_batched_tokens
        self.max_model_len = max_model_len
        # Async scheduling (reference async_scheduler.py:14): schedule step
        # N+1 while step N runs on device. Sampled-but-unreturned tokens are
        # per-request placeholders (num_output_placeholders); their values
        # are gathered device-side by the runner. num_computed_tokens is
        # advanced eagerly at schedule time, not in update_from_output.
        # Incompatible with spec decode (engine disables one of the two).
        self.async_scheduling = (scheduler_config.async_scheduling
                                 and self.spec_method is None)

        self.kv_cache_manager = KVCacheManager(
            kv_cache_config,
            max_model_len=max_model_len,
            enable_caching=cache_config.enable_prefix_caching,
        )
        self.block_size = self.kv_cache_manager.block_size

        # Multimodal encoder-output accounting (reference
        # encoder_cache_manager.py); entries shared by content hash.
        from vllm_trianglemix_tpu.multimodal.encoder_cache import (
            EncoderCacheManager,
        )

        self.encoder_cache_manager = EncoderCacheManager(
            scheduler_config.encoder_cache_size)

        self.requests: dict[str, Request] = {}
        self.waiting = create_request_queue(scheduler_config.policy)
        self.running: list[Request] = []
        # Requests excluded from multi-step decode lookahead (structured
        # output needs a host-side mask every step).
        self.no_lookahead_req_ids: set[str] = set()
        # req_ids finished since the last schedule() — the worker uses this
        # to evict them from its persistent batch.
        self.finished_req_ids: set[str] = set()

    # --- request admission -------------------------------------------------
    def add_request(self, request: Request) -> None:
        if len(request.prompt_token_ids) >= self.max_model_len:
            raise ValueError(
                f"prompt ({len(request.prompt_token_ids)} tokens) is >= "
                f"max_model_len ({self.max_model_len})")
        for item in request.mm_items:
            if item.length > self.scheduler_config.encoder_cache_size:
                raise ValueError(
                    f"multimodal input of {item.length} encoder tokens "
                    f"exceeds encoder_cache_size "
                    f"({self.scheduler_config.encoder_cache_size})")
        self.waiting.add_request(request)
        self.requests[request.request_id] = request

    def abort_requests(self, request_ids: list[str]) -> None:
        waiting_to_remove = set()
        for req_id in request_ids:
            request = self.requests.get(req_id)
            if request is None or request.is_finished:
                continue
            if request.status == RequestStatus.RUNNING:
                self.running.remove(request)
            else:
                waiting_to_remove.add(request)
            request.status = RequestStatus.FINISHED_ABORTED
            self._free_request(request)
        if waiting_to_remove:
            self.waiting.remove_requests(waiting_to_remove)

    # --- multimodal encoder scheduling ---------------------------------------
    def _schedule_mm(self, request: Request, start: int,
                     num_new_tokens: int, mm_state: dict) -> int:
        """Decide encoder work for the chunk [start, start+num_new_tokens)
        (reference scheduler _try_schedule_encoder_inputs): inputs whose
        placeholder span the chunk touches must have cached encoder output
        or be encoded this step. Returns the (possibly truncated) chunk
        length — 0 means the chunk cannot start until encoder budget frees.
        Consumed inputs (span fully behind ``start``) release their cache
        reference."""
        if not request.mm_items:
            return num_new_tokens
        ecm = self.encoder_cache_manager
        for idx, item in enumerate(request.mm_items):
            s, e = item.span
            if e <= start:
                ecm.release_input(request, idx)
                continue
            if s >= start + num_new_tokens:
                break
            if ecm.has_cache(request, idx):
                continue
            if (mm_state["budget"] < item.length
                    or not ecm.can_allocate(request, idx)):
                # Truncate the chunk to just before this item's span.
                num_new_tokens = max(0, s - start)
                break
            mm_state["evicted"].extend(ecm.allocate(request, idx))
            mm_state["budget"] -= item.length
            mm_state["encode"].setdefault(request.request_id,
                                          []).append(idx)
        return num_new_tokens

    def _rollback_mm(self, request: Request, mm_state: dict) -> None:
        """Undo _schedule_mm's allocations for a request that ultimately
        was not scheduled this step (KV allocation failed)."""
        for idx in mm_state["encode"].pop(request.request_id, []):
            item = request.mm_items[idx]
            # Fully remove the entry (not release_input): the encode
            # request is being dropped, so a lingering cached hash would
            # be a phantom hit — later passes would skip encoding and the
            # worker would miss the output in its device pool.
            self.encoder_cache_manager.deallocate(request, idx)
            mm_state["budget"] += item.length

    # --- the scheduling pass -------------------------------------------------
    def schedule(self) -> SchedulerOutput:
        token_budget = self.max_num_batched_tokens
        num_scheduled_tokens: dict[str, int] = {}
        # Per-step encoder compute budget + outputs (multimodal).
        mm_state = {
            "budget": self.scheduler_config.encoder_cache_size,
            "encode": {},
            "evicted": [],
        }

        # Multi-step decode eligibility: whole batch decoding, nothing
        # waiting to admit. KV slots for the lookahead are allocated below.
        k_cfg = self.scheduler_config.multi_step_decode
        # Lookahead must not delay admission — but waiting requests that
        # cannot be admitted anyway (running set at max_num_seqs) don't
        # count.
        waiting_blocked = (not self.waiting
                           or len(self.running) >= self.max_num_seqs)
        multi_step = (
            k_cfg > 1 and self.spec_method is None and waiting_blocked
            and self.running
            and all(r.num_tokens + r.num_output_placeholders
                    - r.num_computed_tokens == 1
                    for r in self.running)
            and not any(r.request_id in self.no_lookahead_req_ids
                        or r.sampling_params.needs_host_sampling
                        for r in self.running))
        num_decode_steps: dict[str, int] = {}
        scheduled_spec_tokens: dict[str, list[int]] = {}
        kv_load_ops: list = []
        kv_save_ops: list = []

        # KV connector push: newly-filled full blocks since last step
        # (reference: connector save hooks in update_from_output).
        if (self.kv_connector is not None
                and self.kv_cache_manager.n_groups == 1):
            for request in self.running:
                full = min(request.num_computed_tokens // self.block_size,
                           len(request.block_hashes))
                saved = getattr(request, "_kv_saved_blocks", 0)
                if full > saved:
                    ids = self.kv_cache_manager.get_block_ids(
                        request.request_id)
                    for j in range(saved, full):
                        h = request.block_hashes[j].hash_value.hex()
                        if not self.kv_connector.exists(h):
                            kv_save_ops.append((h, ids[j]))
                    request._kv_saved_blocks = full

        scheduled_new_reqs: list[Request] = []
        scheduled_resumed_reqs: list[Request] = []
        scheduled_running_reqs: list[Request] = []
        # req_id -> new block ids allocated this step
        new_blocks_per_req: dict[str, list[int]] = {}
        preempted_reqs: set[Request] = set()

        # 1) RUNNING requests first (reference scheduler.py:208-341).
        req_index = 0
        while req_index < len(self.running) and token_budget > 0:
            request = self.running[req_index]
            num_new_tokens = (request.num_tokens
                              + request.num_output_placeholders
                              - request.num_computed_tokens)

            # Async: a pooling request whose prefill is in flight has no
            # further tokens (it finishes at update time; placeholders are
            # never minted for it).
            if (self.async_scheduling and num_new_tokens == 0
                    and request.pooling_params is not None):
                req_index += 1
                continue

            # Async: a decode step whose in-flight tokens will already hit a
            # stop bound must not be scheduled past the end (the position
            # would overflow the block table / max_tokens).
            if self.async_scheduling and request.num_output_placeholders > 0:
                p = request.sampling_params
                past_len = (request.num_tokens
                            + request.num_output_placeholders
                            > self.max_model_len)
                past_max = (p.max_tokens is not None
                            and request.num_output_tokens
                            + request.num_output_placeholders
                            >= p.max_tokens)
                if past_len or past_max:
                    req_index += 1
                    continue

            # Speculative drafts: decode-ready requests get n-gram
            # proposals verified alongside the real token this step —
            # exact token-match acceptance for greedy requests, lossless
            # rejection sampling (sample/sampler.py spec_sample) for
            # temperature>0.
            drafts: list[int] = []
            if (self.spec_method is not None and num_new_tokens == 1
                    and not request.sampling_params.needs_host_sampling
                    and request.request_id not in self.no_lookahead_req_ids):
                room = self.max_model_len - request.num_tokens - 1
                if request.sampling_params.max_tokens is not None:
                    room = min(room, request.sampling_params.max_tokens
                               - request.num_output_tokens - 1)
                if room > 0:
                    if self.proposer is not None:
                        drafts = self.proposer.propose(
                            list(request.all_token_ids))[:room]
                    else:
                        # EAGLE: drafts proposed by the draft model on the
                        # previous step (update_from_output below).
                        drafts = request.spec_token_ids[:room]
                if self.spec_tree and drafts:
                    # trees verify whole-or-nothing, greedy requests only
                    if (len(drafts) < len(request.spec_token_ids)
                            or request.sampling_params.temperature > 0):
                        drafts = []
                if drafts:
                    scheduled_spec_tokens[request.request_id] = drafts
                    num_new_tokens += len(drafts)

            if (self.scheduler_config.long_prefill_token_threshold > 0):
                num_new_tokens = min(
                    num_new_tokens,
                    self.scheduler_config.long_prefill_token_threshold)
            num_new_tokens = min(num_new_tokens, token_budget)
            num_new_tokens = self._schedule_mm(
                request, request.num_computed_tokens, num_new_tokens,
                mm_state)
            if num_new_tokens == 0:
                # Encoder budget blocks this chunk; revisit next step.
                req_index += 1
                continue
            assert num_new_tokens > 0, (
                f"running request {request.request_id} has no new tokens")
            if drafts and num_new_tokens < 1 + len(drafts):
                # budget clipped the drafts (trees drop whole)
                drafts = ([] if self.spec_tree
                          else drafts[:num_new_tokens - 1])
                if drafts:
                    scheduled_spec_tokens[request.request_id] = drafts
                else:
                    scheduled_spec_tokens.pop(request.request_id, None)

            # Decode lookahead: reserve slots for k autoregressive steps.
            num_alloc_tokens = num_new_tokens
            if multi_step:
                params = request.sampling_params
                steps = min(k_cfg, self.max_model_len - request.num_tokens
                            - request.num_output_placeholders)
                if params.max_tokens is not None:
                    steps = min(steps, params.max_tokens
                                - request.num_output_tokens
                                - request.num_output_placeholders)
                steps = max(1, steps)
                num_decode_steps[request.request_id] = steps
                num_alloc_tokens = steps

            # Allocate, preempting by recompute until it fits.
            while True:
                new_blocks = self.kv_cache_manager.allocate_slots(
                    request, num_alloc_tokens)
                if new_blocks is not None:
                    break
                victim = self._choose_preemption_victim(
                    scheduled=num_scheduled_tokens.keys())
                if victim is request or victim is None:
                    # Cannot even fit itself: preempt it too and stop.
                    self._preempt(request)
                    preempted_reqs.add(request)
                    break
                self._preempt(victim)
                preempted_reqs.add(victim)

            if request in preempted_reqs:
                # Removed from running (list shrank) — don't advance index.
                self._rollback_mm(request, mm_state)
                continue

            scheduled_running_reqs.append(request)
            num_scheduled_tokens[request.request_id] = num_new_tokens
            token_budget -= num_new_tokens
            new_blocks_per_req[request.request_id] = new_blocks.get_block_ids()
            req_index += 1

        # 2) WAITING requests (reference scheduler.py:333-450).
        if not preempted_reqs:
            while (self.waiting and token_budget > 0
                   and len(self.running) < self.max_num_seqs):
                request = self.waiting.peek_request()

                # Prefix-cache lookup (new requests only). Requests that
                # want prompt logprobs must compute every prompt position
                # (reference kv_cache_manager.get_computed_blocks skips
                # the lookup for prompt_logprobs requests).
                wants_prompt_lp = (
                    request.sampling_params is not None
                    and request.sampling_params.prompt_logprobs is not None)
                new_computed_blocks, num_hit_tokens = (
                    self.kv_cache_manager.get_computed_blocks(request)
                    if request.status == RequestStatus.WAITING
                    and not wants_prompt_lp else
                    (None, 0))
                num_external_tokens = 0
                if request.status == RequestStatus.WAITING:
                    request.num_computed_tokens = num_hit_tokens
                    if request.num_cached_tokens < 0:
                        request.num_cached_tokens = num_hit_tokens
                    # External KV (reference scheduler.py:389
                    # get_num_new_matched_tokens): blocks available in the
                    # connector beyond the local hit load instead of
                    # recompute.
                    if self.kv_connector is not None:
                        num_external_tokens = \
                            self.kv_connector.get_num_new_matched_tokens(
                                request.block_hashes, num_hit_tokens,
                                self.block_size)
                        # sampling needs >= 1 computable token
                        cap = request.num_tokens - 1 - num_hit_tokens
                        num_external_tokens = max(
                            0, min(num_external_tokens,
                                   (cap // self.block_size)
                                   * self.block_size))
                        request.num_computed_tokens += num_external_tokens

                num_new_tokens = request.num_tokens - request.num_computed_tokens
                if self.scheduler_config.long_prefill_token_threshold > 0:
                    num_new_tokens = min(
                        num_new_tokens,
                        self.scheduler_config.long_prefill_token_threshold)
                if (getattr(request, "no_chunking", False)
                        and num_new_tokens > token_budget):
                    # Encoder-only models (bidirectional attention) must
                    # prefill in ONE shot — wait for a fresher budget.
                    break
                num_new_tokens = min(num_new_tokens, token_budget)
                num_new_tokens = self._schedule_mm(
                    request, request.num_computed_tokens, num_new_tokens,
                    mm_state)
                if num_new_tokens == 0:
                    break  # encoder budget exhausted; admit next step
                assert num_new_tokens > 0

                new_blocks = self.kv_cache_manager.allocate_slots(
                    request,
                    num_new_tokens,
                    num_new_computed_tokens=0,
                    new_computed_blocks=new_computed_blocks,
                )
                if new_blocks is None:
                    self._rollback_mm(request, mm_state)
                    break  # out of KV space; keep waiting

                if num_external_tokens > 0:
                    # Schedule loads for the externally-cached blocks just
                    # allocated: indices [hit_blocks, hit+ext_blocks).
                    all_ids = self.kv_cache_manager.get_block_ids(
                        request.request_id)
                    b0 = (request.num_computed_tokens
                          - num_external_tokens) // self.block_size
                    b1 = request.num_computed_tokens // self.block_size
                    for j in range(b0, b1):
                        kv_load_ops.append(
                            (request.block_hashes[j].hash_value.hex(),
                             all_ids[j]))
                    request.num_cached_tokens += num_external_tokens

                self.waiting.pop_request()
                was_preempted = request.status == RequestStatus.PREEMPTED
                request.status = RequestStatus.RUNNING
                self.running.append(request)
                (scheduled_resumed_reqs if was_preempted
                 else scheduled_new_reqs).append(request)
                num_scheduled_tokens[request.request_id] = num_new_tokens
                token_budget -= num_new_tokens
                new_blocks_per_req[request.request_id] = (
                    self.kv_cache_manager.get_block_ids(request.request_id))

        # 3) Build output.
        total = sum(num_scheduled_tokens.values())
        cached_data = CachedRequestData()
        for request in scheduled_running_reqs:
            cached_data.req_ids.append(request.request_id)
            cached_data.new_block_ids.append(
                new_blocks_per_req[request.request_id] or None)
            cached_data.num_computed_tokens.append(request.num_computed_tokens)
            cached_data.resumed_from_preemption.append(False)
            cached_data.all_token_ids.append(None)
        for request in scheduled_resumed_reqs:
            cached_data.req_ids.append(request.request_id)
            cached_data.new_block_ids.append(
                new_blocks_per_req[request.request_id])
            cached_data.num_computed_tokens.append(request.num_computed_tokens)
            cached_data.resumed_from_preemption.append(True)
            cached_data.all_token_ids.append(list(request.all_token_ids))

        if preempted_reqs or scheduled_new_reqs or scheduled_resumed_reqs:
            # Batch composition changed; the lookahead premise may not hold.
            num_decode_steps = {}

        # Capture new-request snapshots BEFORE the async eager advance below
        # (the worker needs pre-step num_computed_tokens).
        new_reqs_data = [
            NewRequestData.from_request(r, new_blocks_per_req[r.request_id])
            for r in scheduled_new_reqs
        ]

        sampling_req_ids = None
        if self.async_scheduling:
            # Eager bookkeeping (reference async_scheduler.py
            # _update_after_schedule): the scheduled tokens count as
            # computed now; every computed token at/past the end of the
            # known sequence is a sampled-but-in-flight placeholder.
            sampling_req_ids = set()
            for req_id, n in num_scheduled_tokens.items():
                request = self.requests[req_id]
                adv = num_decode_steps.get(req_id, n)
                before_ph = request.num_output_placeholders
                request.num_computed_tokens += adv
                if request.pooling_params is not None:
                    # Pooling requests never mint placeholders, but the
                    # worker must still fetch their pooled vector on the
                    # step their prefill completes.
                    if request.num_computed_tokens >= request.num_tokens:
                        sampling_req_ids.add(req_id)
                    continue
                new_samples = (request.num_computed_tokens
                               - (request.num_tokens + before_ph) + 1)
                if new_samples > 0:
                    request.num_output_placeholders += new_samples
                    sampling_req_ids.add(req_id)

        output = SchedulerOutput(
            scheduled_new_reqs=new_reqs_data,
            scheduled_cached_reqs=cached_data,
            num_scheduled_tokens=num_scheduled_tokens,
            total_num_scheduled_tokens=total,
            finished_req_ids=self.finished_req_ids,
            num_decode_steps=num_decode_steps,
            scheduled_spec_tokens=scheduled_spec_tokens,
            kv_load_ops=kv_load_ops,
            kv_save_ops=kv_save_ops,
            sampling_req_ids=sampling_req_ids,
            scheduled_encoder_inputs=mm_state["encode"],
            freed_encoder_hashes=mm_state["evicted"],
        )
        self.finished_req_ids = set()
        return output

    def _choose_preemption_victim(self, scheduled) -> Optional[Request]:
        """Last-in running request (FCFS) or lowest priority / latest arrival
        (priority policy), reference scheduler.py:254-292. Requests already
        scheduled this step are spared unless nothing else remains."""
        if not self.running:
            return None
        candidates = [r for r in self.running
                      if r.request_id not in scheduled] or self.running
        if self.scheduler_config.policy == "priority":
            return max(candidates,
                       key=lambda r: (r.priority, r.arrival_time))
        return candidates[-1]

    def _preempt(self, request: Request) -> None:
        self.running.remove(request)
        self.kv_cache_manager.free(request)
        if request.mm_items:
            self.encoder_cache_manager.free_request(request)
        request.status = RequestStatus.PREEMPTED
        request.num_computed_tokens = 0
        request.num_preemptions += 1
        self.waiting.prepend_request(request)
        logger.debug("Preempted request %s", request.request_id)

    # --- post-execution update -------------------------------------------------
    def update_from_output(
        self,
        scheduler_output: SchedulerOutput,
        model_output: ModelRunnerOutput,
    ) -> list[EngineCoreOutput]:
        sampled = dict(zip(model_output.req_ids,
                           model_output.sampled_token_ids))
        outputs: list[EngineCoreOutput] = []
        stopped_reqs: list[Request] = []

        for req_id, num_tokens in scheduler_output.num_scheduled_tokens.items():
            request = self.requests.get(req_id)
            if request is None:
                continue  # aborted mid-step
            was_running = request.status == RequestStatus.RUNNING

            if request.pooling_params is not None:
                # Embedding request: finishes when prefill completes; no
                # tokens are appended (reference pooling path).
                request.num_computed_tokens += num_tokens
                if request.num_computed_tokens >= request.num_tokens:
                    request.status = RequestStatus.FINISHED_STOPPED
                    stopped_reqs.append(request)
                    pooled = (model_output.pooled or {}).get(req_id)
                    outputs.append(EngineCoreOutput(
                        request_id=req_id,
                        new_token_ids=[],
                        finished=True,
                        finish_reason="stop",
                        pooled_output=pooled,
                    ))
                continue

            new_token_ids = sampled.get(req_id, [])
            if model_output.draft_tokens is not None:
                # EAGLE: next step's drafts, proposed device-side by the
                # draft model this step.
                request.spec_token_ids = list(
                    model_output.draft_tokens.get(req_id, []))
            stopped = False
            accepted = 0
            if new_token_ids:
                for tok in new_token_ids:
                    request.append_output_token_ids(tok)
                    accepted += 1
                    stopped = self._check_stop(request, tok)
                    if stopped:
                        break
            new_token_ids = new_token_ids[:accepted]
            if self.async_scheduling:
                # num_computed_tokens was advanced at schedule time; the
                # arriving tokens retire their placeholders. (Early-stopped
                # requests are freed below, so over-advanced KV is moot.)
                request.num_output_placeholders = max(
                    0, request.num_output_placeholders - accepted)
            else:
                drafts = scheduler_output.scheduled_spec_tokens.get(req_id)
                if drafts is not None:
                    # Spec decode: scheduled = 1 real + len(drafts); the
                    # runner returned 1..len(drafts)+1 accepted tokens.
                    # Rejected drafts' KV rows are rolled back (reference
                    # update_from_output spec path). Tree drafts never
                    # wrote KV at all — every accepted token recomputes
                    # as a real row next step.
                    num_rejected = (len(drafts) if self.spec_tree
                                    else len(drafts) + 1
                                    - len(new_token_ids))
                    request.num_computed_tokens += num_tokens - num_rejected
                    # Emitted = accepted drafts + 1 (recovery or bonus).
                    self.spec_stats["num_drafts"] += len(drafts)
                    self.spec_stats["num_accepted"] += max(
                        0, len(new_token_ids) - 1)
                else:
                    # Multi-step decode computed KV for `accepted` input
                    # tokens (the scheduled one + accepted-1 sampled
                    # lookahead tokens); normal steps computed exactly the
                    # scheduled tokens.
                    request.num_computed_tokens += max(num_tokens, accepted)
            if stopped:
                stopped_reqs.append(request)
                request._was_running_at_stop = was_running

            plp = (model_output.prompt_logprobs or {}).get(req_id)
            if new_token_ids or stopped or plp:
                lp = (model_output.logprobs or {}).get(req_id)
                outputs.append(
                    EngineCoreOutput(
                        request_id=req_id,
                        new_token_ids=list(new_token_ids),
                        finished=request.is_finished,
                        finish_reason=request.get_finished_reason(),
                        stop_reason=request.stop_reason,
                        new_logprobs=lp[:accepted] if lp else None,
                        new_prompt_logprobs=plp,
                    ))

        for request in stopped_reqs:
            if getattr(request, "_was_running_at_stop", True):
                self.running.remove(request)
            else:
                # Async: the request was preempted while its stop token was
                # in flight — it sits in the waiting queue, not running.
                self.waiting.remove_requests({request})
            self._free_request(request)
        return outputs

    def _check_stop(self, request: Request, last_token_id: int) -> bool:
        """Token-level stop conditions (reference sched/utils.py check_stop).
        Stop strings are the output processor's job."""
        params = request.sampling_params
        if (request.num_tokens >= self.max_model_len
                or request.num_output_tokens >= params.max_tokens):
            request.status = RequestStatus.FINISHED_LENGTH_CAPPED
            return True
        if request.num_output_tokens < params.min_tokens:
            return False
        if (not params.ignore_eos and request.eos_token_id is not None
                and last_token_id == request.eos_token_id):
            request.status = RequestStatus.FINISHED_STOPPED
            return True
        if last_token_id in params.all_stop_token_ids:
            request.status = RequestStatus.FINISHED_STOPPED
            request.stop_reason = last_token_id
            return True
        return False

    def _free_request(self, request: Request) -> None:
        self.kv_cache_manager.free(request)
        if request.mm_items:
            self.encoder_cache_manager.free_request(request)
        self.finished_req_ids.add(request.request_id)
        del self.requests[request.request_id]

    # --- introspection -----------------------------------------------------
    def get_num_unfinished_requests(self) -> int:
        return len(self.waiting) + len(self.running)

    def has_unfinished_requests(self) -> bool:
        return self.get_num_unfinished_requests() > 0

    def make_stats(self) -> SchedulerStats:
        pool = self.kv_cache_manager.block_pool
        return SchedulerStats(
            num_running_reqs=len(self.running),
            num_waiting_reqs=len(self.waiting),
            kv_cache_usage=self.kv_cache_manager.usage,
            prefix_cache_queries=pool.total_queries,
            prefix_cache_hits=pool.hit_queries,
            spec_num_drafts=self.spec_stats["num_drafts"],
            spec_num_accepted=self.spec_stats["num_accepted"],
        )
