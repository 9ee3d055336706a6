"""Async scheduling (reference vllm/v1/core/sched/async_scheduler.py:14).

Scheduler-level: placeholder accounting lets step N+1 be scheduled before
step N's sampled tokens arrive, with identical final outputs. Engine-level:
step N+1 is dispatched to the executor BEFORE step N's results are fetched
(the overlap the feature exists for), verified with a fake executor that
records the event order.
"""

from __future__ import annotations

from tests.core.utils import EOS_TOKEN_ID, create_requests, create_scheduler
from vllm_trianglemix_tpu.core.sched_output import ModelRunnerOutput
from vllm_trianglemix_tpu.request import RequestStatus


def stub_output(so, token=100):
    """Model output for a scheduler_output: every sampling request gets
    `token` (async mode marks samplers explicitly)."""
    req_ids, sampled = [], []
    for req_id in so.num_scheduled_tokens:
        req_ids.append(req_id)
        if so.sampling_req_ids is not None:
            sampled.append([token] if req_id in so.sampling_req_ids else [])
        else:
            sampled.append([token])
    return ModelRunnerOutput(req_ids=req_ids, sampled_token_ids=sampled)


def test_placeholder_accounting_one_request():
    sched = create_scheduler(async_scheduling=True)
    assert sched.async_scheduling
    req = create_requests(1, num_tokens=10, max_tokens=4)[0]
    sched.add_request(req)

    # Step 0: full prompt scheduled; eager advance + one placeholder.
    so0 = sched.schedule()
    assert so0.num_scheduled_tokens[req.request_id] == 10
    assert req.num_computed_tokens == 10
    assert req.num_output_placeholders == 1
    assert req.request_id in so0.sampling_req_ids

    # Step 1 scheduled BEFORE step 0's output: the placeholder token.
    so1 = sched.schedule()
    assert so1.num_scheduled_tokens[req.request_id] == 1
    assert req.num_computed_tokens == 11
    assert req.num_output_placeholders == 2

    # Step 0 output arrives: token appended, placeholder retired.
    sched.update_from_output(so0, stub_output(so0, token=7))
    assert req.output_token_ids == [7]
    assert req.num_output_placeholders == 1
    sched.update_from_output(so1, stub_output(so1, token=8))
    assert req.output_token_ids == [7, 8]
    assert req.num_output_placeholders == 0


def test_async_pipeline_matches_sync_outputs():
    """Depth-1 pipelined loop produces the same tokens/stops as sync."""

    def run(async_mode: bool):
        sched = create_scheduler(async_scheduling=async_mode)
        reqs = create_requests(4, num_tokens=8, max_tokens=5)
        for r in reqs:
            sched.add_request(r)
        tick = 0
        pending = None  # (so, step index it was scheduled at)
        while sched.has_unfinished_requests() or pending:
            so = (sched.schedule()
                  if sched.has_unfinished_requests() else None)
            if pending is not None:
                p_so, p_tick = pending
                sched.update_from_output(
                    p_so, stub_output(p_so, token=200 + p_tick))
            if async_mode:
                pending = ((so, tick)
                           if so and so.num_scheduled_tokens else None)
            else:
                if so is not None and so.num_scheduled_tokens:
                    sched.update_from_output(
                        so, stub_output(so, token=200 + tick))
                pending = None
            tick += 1
            assert tick < 50
        return [list(r.output_token_ids) for r in reqs]

    assert run(True) == run(False)
    out = run(True)
    assert all(len(v) == 5 for v in out)


def test_async_stop_token_not_scheduled_past_end():
    """A request whose stop is in flight must not overflow max_tokens."""
    sched = create_scheduler(async_scheduling=True)
    req = create_requests(1, num_tokens=4, max_tokens=2)[0]
    sched.add_request(req)
    so0 = sched.schedule()          # prompt; samples output 1
    so1 = sched.schedule()          # output-1 placeholder; samples output 2
    assert req.num_output_placeholders == 2
    # Output 2 placeholder would exceed max_tokens=2: nothing scheduled.
    so2 = sched.schedule()
    assert req.request_id not in so2.num_scheduled_tokens
    sched.update_from_output(so0, stub_output(so0))
    sched.update_from_output(so1, stub_output(so1))
    assert req.status == RequestStatus.FINISHED_LENGTH_CAPPED
    assert req.num_output_tokens == 2


def test_async_eos_mid_flight():
    sched = create_scheduler(async_scheduling=True)
    req = create_requests(1, num_tokens=4, max_tokens=10)[0]
    req.sampling_params.ignore_eos = False
    sched.add_request(req)
    so0 = sched.schedule()
    so1 = sched.schedule()          # speculative extra step (in flight)
    # Step 0 sampled EOS: request stops; step 1's token is discarded.
    sched.update_from_output(so0, stub_output(so0, token=EOS_TOKEN_ID))
    assert req.is_finished
    assert not sched.has_unfinished_requests()
    # Late-arriving step-1 output for the freed request is a no-op.
    outs = sched.update_from_output(so1, stub_output(so1, token=5))
    assert outs == []


def test_engine_dispatch_overlaps_fetch(tiny_model_dir, monkeypatch):
    """The engine must dispatch step N+1 before fetching step N."""
    from vllm_trianglemix_tpu.config import (
        CacheConfig,
        EngineConfig,
        ModelConfig,
        SchedulerConfig,
    )
    from vllm_trianglemix_tpu.engine.core import EngineCore
    from vllm_trianglemix_tpu.executor.abstract import Executor
    from vllm_trianglemix_tpu.request import Request
    from vllm_trianglemix_tpu.sampling_params import SamplingParams

    events: list[str] = []

    class FakePending:
        def __init__(self, so, n):
            self.so, self.n = so, n

        def get(self):
            events.append(f"get-{self.n}")
            return stub_output(self.so)

    class FakeExecutor:
        def __init__(self, engine_config):
            self.n = 0

        @property
        def num_kv_blocks(self):
            return 64

        def execute_model(self, so):
            return self.execute_model_async(so).get()

        def execute_model_async(self, so):
            events.append(f"dispatch-{self.n}")
            p = FakePending(so, self.n)
            self.n += 1
            return p

        def compile_or_warm_up_model(self):
            pass

        def shutdown(self):
            pass

    monkeypatch.setattr(Executor, "get_class",
                        staticmethod(lambda cfg: FakeExecutor))
    cfg = EngineConfig(
        model=ModelConfig(model=tiny_model_dir, max_model_len=128,
                          skip_tokenizer_init=True),
        cache=CacheConfig(block_size=16, num_gpu_blocks=64),
        scheduler=SchedulerConfig(max_num_seqs=4,
                                  max_num_batched_tokens=64,
                                  async_scheduling=True),
    )
    core = EngineCore(cfg)
    assert core.async_scheduling
    core.add_request(Request("r0", [1, 2, 3], SamplingParams(
        max_tokens=3, ignore_eos=True)))
    while core.has_unfinished_requests():
        core.step()
    # Each step's dispatch precedes the PREVIOUS step's fetch: overlap.
    i1, g0 = events.index("dispatch-1"), events.index("get-0")
    assert i1 < g0, events
