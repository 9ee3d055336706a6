from tests.core.utils import EOS_TOKEN_ID, create_requests, create_scheduler
from vllm_trianglemix_tpu.core.sched_output import ModelRunnerOutput
from vllm_trianglemix_tpu.request import RequestStatus


def run_model_stub(scheduler_output, next_token=100):
    """Pretend the model sampled `next_token` for every request that
    finished its prompt this step."""
    req_ids, sampled = [], []
    for req_id, _ in scheduler_output.num_scheduled_tokens.items():
        req_ids.append(req_id)
        sampled.append([next_token])
    return ModelRunnerOutput(req_ids=req_ids, sampled_token_ids=sampled)


def test_schedule_new_requests():
    sched = create_scheduler()
    reqs = create_requests(3, num_tokens=10)
    for r in reqs:
        sched.add_request(r)
    out = sched.schedule()
    assert len(out.scheduled_new_reqs) == 3
    assert out.total_num_scheduled_tokens == 30
    assert all(len(n.block_ids) == 1 for n in out.scheduled_new_reqs)


def test_token_budget_chunks_prefill():
    sched = create_scheduler(max_num_batched_tokens=64)
    req = create_requests(1, num_tokens=100)[0]
    sched.add_request(req)
    out = sched.schedule()
    assert out.num_scheduled_tokens[req.request_id] == 64
    # No sampled token yet (prompt not done).
    sched.update_from_output(out, ModelRunnerOutput(
        req_ids=[req.request_id], sampled_token_ids=[[]]))
    assert req.num_computed_tokens == 64
    out2 = sched.schedule()
    assert out2.num_scheduled_tokens[req.request_id] == 36
    # Chunked request shows up as cached, not new.
    assert not out2.scheduled_new_reqs
    assert out2.scheduled_cached_reqs.req_ids == [req.request_id]


def test_decode_loop_until_max_tokens():
    sched = create_scheduler()
    req = create_requests(1, num_tokens=8, max_tokens=3)[0]
    sched.add_request(req)
    steps = 0
    while sched.has_unfinished_requests():
        out = sched.schedule()
        eco = sched.update_from_output(out, run_model_stub(out))
        steps += 1
        assert steps < 20
    assert req.num_output_tokens == 3
    assert req.status == RequestStatus.FINISHED_LENGTH_CAPPED
    assert eco[-1].finish_reason == "length"


def test_eos_stops_request():
    sched = create_scheduler()
    req = create_requests(1, num_tokens=8, max_tokens=50)[0]
    sched.add_request(req)
    out = sched.schedule()
    eco = sched.update_from_output(
        out, ModelRunnerOutput(req_ids=[req.request_id],
                               sampled_token_ids=[[EOS_TOKEN_ID]]))
    assert req.status == RequestStatus.FINISHED_STOPPED
    assert eco[0].finish_reason == "stop"
    assert not sched.has_unfinished_requests()


def test_stop_token_ids():
    sched = create_scheduler()
    req = create_requests(1, num_tokens=8, max_tokens=50)[0]
    req.sampling_params.all_stop_token_ids.add(777)
    sched.add_request(req)
    out = sched.schedule()
    sched.update_from_output(out, ModelRunnerOutput(
        req_ids=[req.request_id], sampled_token_ids=[[777]]))
    assert req.status == RequestStatus.FINISHED_STOPPED
    assert req.stop_reason == 777


def test_max_num_seqs_respected():
    sched = create_scheduler(max_num_seqs=2)
    for r in create_requests(5, num_tokens=4):
        sched.add_request(r)
    out = sched.schedule()
    assert len(out.scheduled_new_reqs) == 2
    assert len(sched.waiting) == 3


def test_preemption_by_recompute():
    # Tiny pool: 8 usable blocks of 16 tokens = 128 tokens of KV.
    sched = create_scheduler(num_blocks=9, max_num_batched_tokens=256,
                             max_model_len=256)
    r1, r2 = create_requests(2, num_tokens=60, max_tokens=40)
    sched.add_request(r1)
    sched.add_request(r2)
    out = sched.schedule()
    assert len(out.scheduled_new_reqs) == 2  # 60+60 = 8 blocks, just fits

    # Decode until pool pressure forces preemption of r2.
    preempted = False
    for _ in range(40):
        if not sched.has_unfinished_requests():
            break
        out = sched.schedule()
        sched.update_from_output(out, run_model_stub(out))
        if r2.num_preemptions > 0:
            preempted = True
            break
    assert preempted
    assert r2.status == RequestStatus.PREEMPTED
    assert r2.num_computed_tokens == 0
    # r2 keeps its generated tokens and will recompute them.
    assert r2.num_output_tokens > 0
    # Engine keeps making progress to completion.
    for _ in range(200):
        if not sched.has_unfinished_requests():
            break
        out = sched.schedule()
        sched.update_from_output(out, run_model_stub(out))
    assert not sched.has_unfinished_requests()
    assert r1.num_output_tokens == 40
    assert r2.num_output_tokens == 40


def test_prefix_cache_hit_reduces_scheduled_tokens():
    sched = create_scheduler(block_size=16)
    r1, r2 = create_requests(2, num_tokens=48, same_prompt=True)
    sched.add_request(r1)
    out = sched.schedule()
    assert out.num_scheduled_tokens[r1.request_id] == 48
    sched.update_from_output(out, run_model_stub(out))
    # r2 arrives later; 2 full blocks (32 tokens) hit in the prefix cache.
    sched.add_request(r2)
    out2 = sched.schedule()
    assert out2.num_scheduled_tokens[r2.request_id] == 48 - 32
    assert r2.num_cached_tokens == 32


def test_abort_requests():
    sched = create_scheduler()
    reqs = create_requests(3, num_tokens=8)
    for r in reqs:
        sched.add_request(r)
    out = sched.schedule()
    sched.update_from_output(out, run_model_stub(out))
    sched.abort_requests([reqs[1].request_id])
    assert reqs[1].status == RequestStatus.FINISHED_ABORTED
    assert sched.get_num_unfinished_requests() == 2
    out2 = sched.schedule()
    assert reqs[1].request_id not in out2.num_scheduled_tokens
    assert reqs[1].request_id in out2.finished_req_ids


def test_priority_policy_order():
    sched = create_scheduler(policy="priority", max_num_seqs=1)
    lo = create_requests(1, num_tokens=4, priority=10)[0]
    hi = create_requests(1, num_tokens=4, priority=0)[0]
    sched.add_request(lo)
    sched.add_request(hi)
    out = sched.schedule()
    assert out.scheduled_new_reqs[0].req_id == hi.request_id


def test_long_prefill_token_threshold():
    sched = create_scheduler(long_prefill_token_threshold=32)
    req = create_requests(1, num_tokens=100)[0]
    sched.add_request(req)
    out = sched.schedule()
    assert out.num_scheduled_tokens[req.request_id] == 32
