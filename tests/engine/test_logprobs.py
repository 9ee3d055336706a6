"""Logprobs: engine-level correctness and API shape."""

import numpy as np

from vllm_trianglemix_tpu.sampling_params import SamplingParams


def test_logprobs_returned_and_consistent(tiny_llm):
    out = tiny_llm.generate(
        [[5, 6, 7]],
        SamplingParams(max_tokens=4, temperature=0.0, ignore_eos=True,
                       logprobs=3))[0]
    comp = out.outputs[0]
    assert comp.logprobs is not None and len(comp.logprobs) == 4
    for tid, row in zip(comp.token_ids, comp.logprobs):
        assert tid in row                      # sampled token present
        assert len(row) >= 3
        assert all(v <= 0.0 for v in row.values())
        # greedy: the sampled token must be the most likely one
        assert row[tid] == max(row.values())
    assert comp.cumulative_logprob is not None
    assert np.isclose(comp.cumulative_logprob,
                      sum(r[t] for t, r in zip(comp.token_ids,
                                               comp.logprobs)))


def test_logprobs_only_when_requested(tiny_llm):
    out = tiny_llm.generate(
        [[8, 9]],
        SamplingParams(max_tokens=3, temperature=0.0, ignore_eos=True))[0]
    assert out.outputs[0].logprobs is None
