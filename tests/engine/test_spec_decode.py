"""Ngram speculative decoding: exact greedy equivalence and acceptance.

The n-gram proposer drafts from prompt history; greedy acceptance must
leave outputs token-identical to plain decoding in every case (that's the
whole point of speculation)."""

import numpy as np
import pytest

from vllm_trianglemix_tpu.entrypoints.llm import LLM
from vllm_trianglemix_tpu.sampling_params import SamplingParams

SPEC = {"method": "ngram", "num_speculative_tokens": 4,
        "prompt_lookup_max": 3, "prompt_lookup_min": 1}


def make_llm(tiny_model_dir, spec=None):
    return LLM(model=tiny_model_dir, dtype="float32", max_model_len=128,
               max_num_seqs=4, max_num_batched_tokens=64, num_kv_blocks=48,
               speculative_config=spec)


@pytest.fixture(scope="module")
def base(tiny_model_dir):
    return make_llm(tiny_model_dir)


@pytest.fixture(scope="module")
def spec(tiny_model_dir):
    return make_llm(tiny_model_dir, SPEC)


def gen(llm, prompts, **kw):
    params = SamplingParams(temperature=0.0, **kw)
    return [o.outputs[0].token_ids for o in llm.generate(prompts, params)]


def test_equivalence_random_prompts(base, spec):
    rng = np.random.default_rng(0)
    prompts = [rng.integers(1, 400, size=n).tolist() for n in (6, 11, 4)]
    assert gen(base, prompts, max_tokens=12, ignore_eos=True) == \
        gen(spec, prompts, max_tokens=12, ignore_eos=True)


def test_equivalence_repetitive_prompt(base, spec):
    # Highly repetitive prompt: drafts will actually be proposed and
    # (often) accepted; outputs must still be identical.
    p = [[7, 8, 9, 7, 8, 9, 7, 8, 9, 7, 8]]
    assert gen(base, p, max_tokens=15, ignore_eos=True) == \
        gen(spec, p, max_tokens=15, ignore_eos=True)


def test_equivalence_max_tokens_boundary(base, spec):
    p = [[5, 6, 5, 6, 5]]
    for mt in (1, 2, 3, 5):
        assert gen(base, p, max_tokens=mt, ignore_eos=True) == \
            gen(spec, p, max_tokens=mt, ignore_eos=True)


def test_drafts_are_proposed_and_accepted(spec):
    # model repeats under greedy with tiny random weights on a cyclic
    # prompt; verify the engine actually took a multi-token step at least
    # once by counting engine iterations vs tokens.
    eng = spec.llm_engine
    p = [7, 8, 9, 7, 8, 9, 7, 8, 9, 7, 8]
    params = SamplingParams(temperature=0.0, max_tokens=15, ignore_eos=True)
    eng.add_request("s", p, params)
    steps = 0
    toks = None
    while eng.has_unfinished_requests():
        outs = eng.step()
        steps += 1
        for o in outs:
            if o.finished:
                toks = o.outputs[0].token_ids
        assert steps < 100
    assert toks is not None and len(toks) == 15
    # prefill took 1 step; if no draft were ever accepted we'd need 15
    # more steps. Only assert the plumbing allows multi-token steps when
    # the model is actually repetitive:
    if len(set(toks)) <= 3:
        assert steps < 16


def test_sampled_requests_skip_speculation(spec):
    p = [[9, 10, 11, 9, 10]]
    params = SamplingParams(temperature=0.9, seed=11, max_tokens=6,
                            ignore_eos=True)
    out = spec.generate(p, params)[0]
    assert len(out.outputs[0].token_ids) == 6


def test_spec_with_stop_token(base, spec):
    p = [[3, 4, 3, 4, 3]]
    free = gen(spec, p, max_tokens=10, ignore_eos=True)[0]
    stop_tok = free[1]
    a = gen(base, p, max_tokens=10, ignore_eos=True,
            stop_token_ids=[stop_tok])
    b = gen(spec, p, max_tokens=10, ignore_eos=True,
            stop_token_ids=[stop_tok])
    assert a == b
