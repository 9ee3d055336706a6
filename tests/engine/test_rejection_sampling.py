"""Rejection sampling for temperature>0 speculative decoding.

The reference's RejectionSampler (vllm/v1/sample/rejection_sampler.py)
guarantees the emitted tokens are distributed exactly as ordinary
sampling. With a deterministic (n-gram) proposal the scheme reduces to:
accept the draft with probability p(draft); on rejection, resample from
p with the draft removed, renormalized. These tests check that property
empirically for ``spec_sample`` and exercise the engine path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vllm_trianglemix_tpu.sample.metadata import build_sampling_metadata
from vllm_trianglemix_tpu.sample.sampler import spec_sample
from vllm_trianglemix_tpu.sampling_params import SamplingParams


def _smd(n_rows, temperature=1.0, top_k=0, top_p=1.0, seeds=None):
    params = [SamplingParams(temperature=temperature, top_k=top_k,
                             top_p=top_p) for _ in range(n_rows)]
    counters = list(range(n_rows)) if seeds is None else list(seeds)
    return build_sampling_metadata(params, counters, n_rows)


def _emitted(logits_row, draft, n, temperature=1.0, top_k=0, top_p=1.0):
    """Empirical distribution of the emitted token over n trials."""
    V = logits_row.shape[0]
    logits = jnp.tile(jnp.asarray(logits_row)[None, :], (n, 1))
    drafts = jnp.full(n, draft, jnp.int32)
    md = _smd(n, temperature=temperature, top_k=top_k, top_p=top_p)
    key = jax.random.PRNGKey(0)
    _, accept, recovery = jax.jit(spec_sample)(logits, md, key, drafts)
    accept = np.asarray(accept)
    recovery = np.asarray(recovery)
    emitted = np.where(accept, draft, recovery)
    return np.bincount(emitted, minlength=V) / n


def test_emitted_distribution_matches_target():
    # accept-draft + resample-on-reject must reproduce softmax(logits).
    rng = np.random.default_rng(0)
    logits = rng.normal(size=8).astype(np.float32) * 2.0
    target = np.exp(logits - logits.max())
    target /= target.sum()
    n = 8192
    for draft in (0, 3, int(np.argmax(logits))):
        emp = _emitted(logits, draft, n)
        assert np.abs(emp - target).max() < 4.5 / np.sqrt(n), (
            draft, emp, target)


def test_emitted_distribution_respects_top_k():
    rng = np.random.default_rng(1)
    logits = rng.normal(size=16).astype(np.float32) * 2.0
    k = 4
    keep = np.argsort(logits)[-k:]
    target = np.zeros(16)
    target[keep] = np.exp(logits[keep] - logits[keep].max())
    target /= target.sum()
    n = 8192
    # draft outside top-k must (a) never be emitted, (b) leave the
    # distribution intact.
    draft_out = int(np.argsort(logits)[0])
    emp = _emitted(logits, draft_out, n, top_k=k)
    assert emp[draft_out] == 0.0
    assert np.abs(emp - target).max() < 4.5 / np.sqrt(n)


def test_greedy_rows_are_exact_match():
    V = 8
    logits = jnp.tile(jnp.asarray(
        np.eye(V, dtype=np.float32)[3] * 10.0)[None, :], (4, 1))
    md = _smd(4, temperature=0.0)
    drafts = jnp.asarray([3, 3, 5, -1], jnp.int32)
    key = jax.random.PRNGKey(7)
    tokens, accept, recovery = spec_sample(logits, md, key, drafts)
    assert np.asarray(tokens).tolist() == [3, 3, 3, 3]
    assert np.asarray(accept).tolist() == [True, True, False, False]
    assert np.asarray(recovery).tolist() == [3, 3, 3, 3]


def test_rows_use_distinct_noise():
    # Identical logits + distinct counters must not all emit the same
    # token (correlated folds would).
    logits = jnp.zeros((64, 16), jnp.float32)  # uniform target
    md = _smd(64)
    drafts = jnp.full(64, -1, jnp.int32)
    tokens, accept, _ = spec_sample(logits, md, jax.random.PRNGKey(3),
                                    drafts)
    assert not bool(np.asarray(accept).any())
    assert len(set(np.asarray(tokens).tolist())) > 4


SPEC = {"method": "ngram", "num_speculative_tokens": 4,
        "prompt_lookup_max": 3, "prompt_lookup_min": 1}


@pytest.fixture(scope="module")
def spec_llm(tiny_model_dir):
    from vllm_trianglemix_tpu.entrypoints.llm import LLM

    return LLM(model=tiny_model_dir, dtype="float32", max_model_len=128,
               max_num_seqs=4, max_num_batched_tokens=64, num_kv_blocks=48,
               speculative_config=SPEC)


def test_sampled_requests_speculate_e2e(spec_llm):
    # Repetitive prompt at temperature>0: drafts are proposed and the
    # rejection path runs; outputs must have the exact requested length
    # and valid token ids. (Same-process reruns aren't bit-identical —
    # the engine key advances — so only structural properties hold.)
    p = [[7, 8, 9, 7, 8, 9, 7, 8, 9, 7, 8]]
    params = SamplingParams(temperature=0.8, seed=5, max_tokens=12,
                            ignore_eos=True)
    a = spec_llm.generate(p, params)[0].outputs[0].token_ids
    assert len(a) == 12
    assert all(0 <= t < 600 for t in a)


def test_mixed_greedy_and_sampled_batch(spec_llm):
    prompts = [[7, 8, 9, 7, 8, 9, 7, 8], [5, 6, 5, 6, 5, 6, 5]]
    params = [SamplingParams(temperature=0.0, max_tokens=8,
                             ignore_eos=True),
              SamplingParams(temperature=0.7, seed=3, max_tokens=8,
                             ignore_eos=True)]
    outs = spec_llm.generate(prompts, params)
    assert all(len(o.outputs[0].token_ids) == 8 for o in outs)
