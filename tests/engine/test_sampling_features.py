"""Penalties, logit bias, allowed tokens, bad words, min-tokens masking."""

import numpy as np

from vllm_trianglemix_tpu.sampling_params import SamplingParams


def gen(llm, prompt, **kw):
    params = SamplingParams(temperature=0.0, **kw)
    return llm.generate([prompt], params)[0].outputs[0].token_ids


def test_allowed_token_ids(tiny_llm):
    toks = gen(tiny_llm, [5, 6, 7], max_tokens=6, ignore_eos=True,
               allowed_token_ids=[42, 43, 44])
    assert set(toks) <= {42, 43, 44}


def test_logit_bias_forces_token(tiny_llm):
    toks = gen(tiny_llm, [8, 9, 10], max_tokens=4, ignore_eos=True,
               logit_bias={77: 1000.0})
    assert toks == [77, 77, 77, 77]


def test_presence_penalty_discourages_repeats(tiny_llm):
    base = gen(tiny_llm, [11, 12, 13], max_tokens=8, ignore_eos=True)
    if len(set(base)) == len(base):
        return  # model doesn't repeat anyway; nothing to assert
    pen = gen(tiny_llm, [11, 12, 13], max_tokens=8, ignore_eos=True,
              presence_penalty=2.0, frequency_penalty=2.0)
    # strong penalties must yield strictly more distinct tokens
    assert len(set(pen)) > len(set(base))


def test_repetition_penalty_changes_output(tiny_llm):
    base = gen(tiny_llm, [14, 15, 16], max_tokens=8, ignore_eos=True)
    if len(set(base)) == len(base):
        return
    pen = gen(tiny_llm, [14, 15, 16], max_tokens=8, ignore_eos=True,
              repetition_penalty=5.0)
    assert pen != base


def test_bad_words_token_ids(tiny_llm):
    base = gen(tiny_llm, [17, 18, 19], max_tokens=6, ignore_eos=True)
    banned = base[0]
    toks = gen(tiny_llm, [17, 18, 19], max_tokens=6, ignore_eos=True,
               bad_words_token_ids=[[banned]])
    assert banned not in toks


def test_bad_words_multi_token_sequence(tiny_llm):
    base = gen(tiny_llm, [20, 21, 22], max_tokens=6, ignore_eos=True)
    if len(base) < 2 or base[0] == base[1]:
        seq = [base[0]]
    else:
        seq = [base[0], base[1]]
    toks = gen(tiny_llm, [20, 21, 22], max_tokens=6, ignore_eos=True,
               bad_words_token_ids=[seq])
    # the banned sequence must not appear contiguously
    joined = list(toks)
    for i in range(len(joined) - len(seq) + 1):
        assert joined[i:i + len(seq)] != seq


def test_min_tokens_blocks_eos(tiny_llm):
    # force EOS to be the argmax via logit_bias, but require 5 tokens
    eos = 501
    toks = gen(tiny_llm, [23, 24, 25], max_tokens=8,
               logit_bias={eos: 1000.0}, min_tokens=5)
    # EOS banned for the first 5 tokens; sampled immediately after
    assert len(toks) == 6
    assert toks[-1] == eos
    assert eos not in toks[:-1]


def test_penalized_request_mixes_with_clean_batch(tiny_llm):
    params = [
        SamplingParams(temperature=0.0, max_tokens=5, ignore_eos=True,
                       logit_bias={88: 1000.0}),
        SamplingParams(temperature=0.0, max_tokens=5, ignore_eos=True),
    ]
    outs = tiny_llm.generate([[26, 27], [26, 27]], params)
    assert outs[0].outputs[0].token_ids == [88] * 5
    # the clean request must be unaffected by its neighbor's bias
    clean = gen(tiny_llm, [26, 27], max_tokens=5, ignore_eos=True)
    assert outs[1].outputs[0].token_ids == clean
