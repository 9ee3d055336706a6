"""Multi-step decode equivalence: K device-side autoregressive steps per
dispatch must produce exactly the same greedy tokens as step-by-step
decoding, including EOS / stop-token / max_tokens truncation inside the
lookahead window."""

import numpy as np
import pytest

from vllm_trianglemix_tpu.entrypoints.llm import LLM
from vllm_trianglemix_tpu.sampling_params import SamplingParams


def make_llm(tiny_model_dir, k):
    return LLM(model=tiny_model_dir, dtype="float32", max_model_len=128,
               max_num_seqs=4, max_num_batched_tokens=64, num_kv_blocks=48,
               multi_step_decode=k)


@pytest.fixture(scope="module")
def base(tiny_model_dir):
    return make_llm(tiny_model_dir, 1)


@pytest.fixture(scope="module")
def multi(tiny_model_dir):
    return make_llm(tiny_model_dir, 4)


def gen(llm, prompts, **kw):
    params = SamplingParams(temperature=0.0, **kw)
    return [o.outputs[0].token_ids
            for o in llm.generate(prompts, params)]


def test_greedy_equivalence_single_request(base, multi):
    p = [[7, 8, 9, 10, 11]]
    assert gen(base, p, max_tokens=13, ignore_eos=True) == \
        gen(multi, p, max_tokens=13, ignore_eos=True)


def test_greedy_equivalence_batch(base, multi):
    rng = np.random.default_rng(0)
    prompts = [rng.integers(1, 400, size=n).tolist() for n in (5, 9, 3)]
    assert gen(base, prompts, max_tokens=10, ignore_eos=True) == \
        gen(multi, prompts, max_tokens=10, ignore_eos=True)


def test_max_tokens_not_multiple_of_k(base, multi):
    p = [[5, 6, 7]]
    for mt in (1, 2, 3, 5, 7):
        assert gen(base, p, max_tokens=mt, ignore_eos=True) == \
            gen(multi, p, max_tokens=mt, ignore_eos=True)


def test_stop_token_inside_window(base, multi, tiny_model_dir):
    # find a token the model actually emits, then use it as a stop token
    p = [[11, 12, 13]]
    free = gen(multi, p, max_tokens=8, ignore_eos=True)[0]
    stop_tok = free[2]
    a = gen(base, p, max_tokens=8, ignore_eos=True, stop_token_ids=[stop_tok])
    b = gen(multi, p, max_tokens=8, ignore_eos=True,
            stop_token_ids=[stop_tok])
    assert a == b
    assert a[0][-1] == stop_tok and len(a[0]) <= 3


def test_mixed_arrival_prefill_then_decode(tiny_model_dir, multi):
    # second request arrives while the first decodes: the scheduler must
    # drop the lookahead for the mixed step and re-enter multi-step after.
    eng = multi.llm_engine
    params = SamplingParams(temperature=0.0, max_tokens=9, ignore_eos=True)
    eng.add_request("a", [3, 4, 5], params)
    outs = {}
    for _ in range(3):
        for o in eng.step():
            if o.finished:
                outs[o.request_id] = o.outputs[0].token_ids
    eng.add_request("b", [6, 7, 8], params)
    while eng.has_unfinished_requests():
        for o in eng.step():
            if o.finished:
                outs[o.request_id] = o.outputs[0].token_ids
    ref = gen(LLM(model=tiny_model_dir, dtype="float32", max_model_len=128,
                  max_num_seqs=4, max_num_batched_tokens=64,
                  num_kv_blocks=48),
              [[3, 4, 5], [6, 7, 8]], max_tokens=9, ignore_eos=True)
    assert outs["a"] == ref[0]
    assert outs["b"] == ref[1]


def test_random_sampling_seeded_runs(multi):
    # sampled path must run (not crash) and be deterministic per seed
    p = [[9, 10, 11]]
    params = SamplingParams(temperature=0.8, top_p=0.9, seed=7, max_tokens=6,
                            ignore_eos=True)
    a = [o.outputs[0].token_ids for o in multi.generate(p, params)]
    assert len(a[0]) == 6
