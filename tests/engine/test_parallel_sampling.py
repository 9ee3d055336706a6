"""n>1 parallel sampling fan-out/fan-in (reference parallel_sampling.py)."""

from vllm_trianglemix_tpu.sampling_params import SamplingParams


def test_n_greedy_identical(tiny_llm):
    out = tiny_llm.generate(
        [[5, 6, 7]],
        SamplingParams(n=3, temperature=0.0, max_tokens=5,
                       ignore_eos=True))[0]
    assert len(out.outputs) == 3
    assert [c.index for c in out.outputs] == [0, 1, 2]
    assert out.outputs[0].token_ids == out.outputs[1].token_ids \
        == out.outputs[2].token_ids


def test_n_sampled_with_seed_varies(tiny_llm):
    out = tiny_llm.generate(
        [[8, 9, 10]],
        SamplingParams(n=4, temperature=1.5, seed=5, max_tokens=6,
                       ignore_eos=True))[0]
    assert len(out.outputs) == 4
    seqs = [tuple(c.token_ids) for c in out.outputs]
    assert len(set(seqs)) > 1  # per-sample seeds differ


def test_n_mixed_batch_order(tiny_llm):
    params = [
        SamplingParams(n=2, temperature=0.0, max_tokens=3, ignore_eos=True),
        SamplingParams(n=1, temperature=0.0, max_tokens=3, ignore_eos=True),
    ]
    outs = tiny_llm.generate([[11, 12], [13, 14]], params)
    assert len(outs) == 2
    assert len(outs[0].outputs) == 2
    assert len(outs[1].outputs) == 1
