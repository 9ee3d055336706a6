"""Medusa speculative decoding: exactness and acceptance plumbing.

Reference analogue: vllm/v1/spec_decode medusa tests — drafts from K
residual heads, verified losslessly, outputs identical to the plain
engine regardless of head quality.
"""

import numpy as np
import pytest

from vllm_trianglemix_tpu.sampling_params import SamplingParams


@pytest.fixture(scope="module")
def medusa_llm(tiny_model_dir):
    from vllm_trianglemix_tpu.entrypoints.llm import LLM

    return LLM(model=tiny_model_dir, dtype="float32", max_model_len=256,
               max_num_seqs=8, max_num_batched_tokens=128, num_kv_blocks=64,
               speculative_config={"method": "medusa",
                                   "num_speculative_tokens": 3})


def test_medusa_greedy_exact(medusa_llm, tiny_llm):
    """Random medusa heads (mostly rejected drafts) must not change greedy
    outputs — verification is lossless."""
    sp = SamplingParams(max_tokens=12, temperature=0.0, ignore_eos=True)
    prompts = [[5, 6, 7], [9, 10, 11, 12], [20, 21]]
    ref = tiny_llm.generate(prompts, sp)
    out = medusa_llm.generate(prompts, sp)
    for o, r in zip(out, ref):
        assert list(o.outputs[0].token_ids) == list(r.outputs[0].token_ids)


def test_medusa_acceptance_counters(medusa_llm):
    sp = SamplingParams(max_tokens=8, temperature=0.0, ignore_eos=True)
    medusa_llm.generate([[3, 4, 5]], sp)
    stats = medusa_llm.llm_engine.engine_core.scheduler.make_stats()
    assert stats.spec_num_drafts > 0
    assert 0 <= stats.spec_num_accepted <= stats.spec_num_drafts


def test_medusa_conditioning_row_walk():
    """Unit: the jitted acceptance walk picks the hidden row of the final
    emitted token (row ``na`` of the request's sampling rows)."""
    import jax.numpy as jnp

    from vllm_trianglemix_tpu.attention.metadata import AttentionMetadata
    from vllm_trianglemix_tpu.spec_decode.medusa import (
        build_medusa_fn,
        init_random_medusa,
    )

    class Cfg:
        hidden_size = 8
        vocab_size = 32

    K = 3
    S = 4  # 1 + K sampling rows per request
    R = 2
    T = 8
    mparams = init_random_medusa(Cfg, K, dtype=jnp.float32)
    fn = build_medusa_fn(K)

    # request 0: rows [0..3], 3 drafts, first rejected -> na=0, row 0
    # request 1: rows [4..7], 3 drafts, all accepted  -> na=3, row 7
    hidden = jnp.arange(T * 8, dtype=jnp.float32).reshape(T, 8)
    md = AttentionMetadata(
        positions=jnp.zeros(T, jnp.int32),
        req_idx=jnp.repeat(jnp.arange(2, dtype=jnp.int32), 4),
        slot_mapping=jnp.zeros(T, jnp.int32),
        block_tables=jnp.zeros((R, 4), jnp.int32),
        seq_lens=jnp.ones(R, jnp.int32),
        prompt_lens=jnp.ones(R, jnp.int32),
        query_start_loc=jnp.asarray([0, 4, 8], jnp.int32),
        logits_indices=jnp.arange(R * S, dtype=jnp.int32),
        num_reqs=jnp.asarray(R, jnp.int32),
    )
    accept = jnp.asarray([False, False, False, False,
                          True, True, True, False])
    drafts = fn(mparams, hidden, md, jnp.zeros(R * S, jnp.int32), accept,
                jnp.asarray([3, 3], jnp.int32), jnp.asarray([True, True]))
    assert drafts.shape == (R, K)

    # compare against direct head application on rows 0 and 7
    def heads(h):
        import jax

        hk = h[None] + jax.nn.silu(
            jnp.einsum("d,kde->ke", h, mparams["w"]) + mparams["b"])
        lg = jnp.einsum("kd,kdv->kv", hk, mparams["head"])
        return np.asarray(jnp.argmax(lg, -1))

    np.testing.assert_array_equal(np.asarray(drafts[0]), heads(hidden[0]))
    np.testing.assert_array_equal(np.asarray(drafts[1]), heads(hidden[7]))
