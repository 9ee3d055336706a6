"""Beam search: width, ordering, and dominance over greedy."""

import numpy as np

from vllm_trianglemix_tpu.sampling_params import SamplingParams


def test_beam_search_basics(tiny_llm):
    prompt = [5, 6, 7]
    beams = tiny_llm.beam_search([prompt], beam_width=3, max_tokens=5,
                                 ignore_eos=True)[0]
    assert len(beams) == 3
    scores = [b["cumulative_logprob"] for b in beams]
    assert scores == sorted(scores, reverse=True)
    assert all(len(b["token_ids"]) == 5 for b in beams)

    # the best beam must score at least as well as pure greedy
    greedy = tiny_llm.generate(
        [prompt], SamplingParams(max_tokens=5, temperature=0.0,
                                 ignore_eos=True, logprobs=1))[0]
    greedy_lp = greedy.outputs[0].cumulative_logprob
    assert beams[0]["cumulative_logprob"] >= greedy_lp - 1e-4


def test_beam_search_multiple_prompts(tiny_llm):
    outs = tiny_llm.beam_search([[8, 9], [10, 11, 12]], beam_width=2,
                                max_tokens=3, ignore_eos=True)
    assert len(outs) == 2
    assert all(len(o) == 2 for o in outs)
