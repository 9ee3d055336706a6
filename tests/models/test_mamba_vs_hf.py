"""Mamba numerics parity vs HuggingFace.

Pins the ragged-segment selective scan (models/mamba.py): causal conv
with cached history taps, softplus dt discretization, associative-scan
recurrence with per-segment state injection, D skip + silu(z) gate —
against HF's sequential slow_forward (modeling_mamba.py:360-440).
"""

import json

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
from transformers import MambaConfig as HFMambaConfig  # noqa: E402
from transformers import MambaForCausalLM  # noqa: E402

from vllm_trianglemix_tpu.attention.metadata import AttentionMetadata  # noqa: E402
from vllm_trianglemix_tpu.config import TriangleMixConfig  # noqa: E402
from vllm_trianglemix_tpu.models import mamba  # noqa: E402
from vllm_trianglemix_tpu.models.weights import torch_state_dict_reader  # noqa: E402

BASE = dict(
    vocab_size=256,
    hidden_size=64,
    state_size=8,
    conv_kernel=4,
    intermediate_size=128,
    time_step_rank=4,
    num_hidden_layers=2,
    layer_norm_epsilon=1e-5,
    use_bias=False,
    use_conv_bias=True,
    tie_word_embeddings=True,
)


def build(seed=0):
    torch.manual_seed(seed)
    hf = MambaForCausalLM(HFMambaConfig(**BASE)).eval().float()
    cfg = mamba.MambaConfig.from_hf_config(BASE)
    params = mamba.params_from_hf_state_dict(
        cfg, torch_state_dict_reader(hf.state_dict()), dtype=jnp.float32)
    return hf, cfg, params


def seq_md(token_ids_per_req, slots, chunk_starts=None):
    """Metadata for a ragged batch; each request's state lives in its
    slot. chunk_starts: per-request number of already-computed tokens."""
    R = len(token_ids_per_req)
    starts = chunk_starts or [0] * R
    T = sum(len(t) for t in token_ids_per_req)
    positions, req_idx = [], []
    qsl = [0]
    for r, toks in enumerate(token_ids_per_req):
        positions.extend(range(starts[r], starts[r] + len(toks)))
        req_idx.extend([r] * len(toks))
        qsl.append(qsl[-1] + len(toks))
    bt = np.zeros((R, 2), np.int32)
    bt[:, 0] = slots
    return AttentionMetadata(
        positions=jnp.asarray(positions, jnp.int32),
        req_idx=jnp.asarray(req_idx, jnp.int32),
        slot_mapping=jnp.zeros(T, jnp.int32),
        block_tables=jnp.asarray(bt),
        seq_lens=jnp.asarray([s + len(t) for s, t in
                              zip(starts, token_ids_per_req)], jnp.int32),
        prompt_lens=jnp.asarray([len(t) for t in token_ids_per_req],
                                jnp.int32),
        query_start_loc=jnp.asarray(qsl, jnp.int32),
        logits_indices=jnp.asarray([q - 1 for q in qsl[1:]], jnp.int32),
        num_reqs=jnp.asarray(R, jnp.int32),
    )


def test_mamba_prefill_matches_hf():
    hf, cfg, params = build()
    rng = np.random.default_rng(0)
    p1 = rng.integers(1, 256, size=17).tolist()
    p2 = rng.integers(1, 256, size=9).tolist()
    states = jnp.zeros((cfg.num_hidden_layers, 4, cfg.state_row_width),
                       jnp.float32)
    md = seq_md([p1, p2], slots=[1, 2])
    hidden, states = mamba.forward(
        params, cfg, TriangleMixConfig(),
        jnp.asarray(p1 + p2, jnp.int32), states, md,
        jnp.zeros(cfg.num_hidden_layers, bool))
    ours = np.asarray(mamba.compute_logits(params, cfg, hidden))
    with torch.no_grad():
        ref1 = hf(torch.tensor([p1])).logits[0].numpy()
        ref2 = hf(torch.tensor([p2])).logits[0].numpy()
    np.testing.assert_allclose(ours[:17], ref1, atol=5e-4, rtol=5e-3)
    np.testing.assert_allclose(ours[17:], ref2, atol=5e-4, rtol=5e-3)


def test_mamba_chunked_and_decode_match_full():
    """Chunked prefill + stepwise decode through the state cache must
    equal one full forward (state carry across chunk boundaries, conv
    history taps, decode path)."""
    hf, cfg, params = build(seed=1)
    rng = np.random.default_rng(1)
    seq = rng.integers(1, 256, size=23).tolist()
    tri = jnp.zeros(cfg.num_hidden_layers, bool)

    states = jnp.zeros((cfg.num_hidden_layers, 4, cfg.state_row_width),
                       jnp.float32)
    md = seq_md([seq], slots=[1])
    hidden_full, _ = mamba.forward(params, cfg, TriangleMixConfig(),
                                   jnp.asarray(seq, jnp.int32), states,
                                   md, tri)
    full_logits = np.asarray(
        mamba.compute_logits(params, cfg, hidden_full))

    # chunked: 10 + 9 + 4, then 3 decode steps
    states = jnp.zeros_like(states)
    outs = []
    done = 0
    for n in (10, 9, 4):
        chunk = seq[done:done + n]
        md_c = seq_md([chunk], slots=[1], chunk_starts=[done])
        hidden, states = mamba.forward(
            params, cfg, TriangleMixConfig(),
            jnp.asarray(chunk, jnp.int32), states, md_c, tri)
        outs.append(np.asarray(
            mamba.compute_logits(params, cfg, hidden)))
        done += n
    chunked = np.concatenate(outs)
    np.testing.assert_allclose(chunked, full_logits, atol=5e-4, rtol=5e-3)

    # greedy decode continues identically to HF generate
    hf.generation_config.eos_token_id = None
    with torch.no_grad():
        ref = hf.generate(torch.tensor([seq]), do_sample=False,
                          max_new_tokens=4)[0, len(seq):].tolist()
    tok = int(full_logits[-1].argmax())
    got = [tok]
    pos = len(seq)
    for _ in range(3):
        md_1 = seq_md([[tok]], slots=[1], chunk_starts=[pos])
        hidden, states = mamba.forward(
            params, cfg, TriangleMixConfig(),
            jnp.asarray([tok], jnp.int32), states, md_1, tri)
        tok = int(np.asarray(
            mamba.compute_logits(params, cfg, hidden))[-1].argmax())
        got.append(tok)
        pos += 1
    assert got == ref


def test_mamba_engine_e2e(tmp_path):
    """Full engine path: MambaSpec state slots through the allocator,
    warmup, mixed batches — vs HF greedy generate."""
    from safetensors.torch import save_file

    from vllm_trianglemix_tpu.entrypoints.llm import LLM
    from vllm_trianglemix_tpu.sampling_params import SamplingParams

    hf, cfg, _ = build(seed=2)
    d = tmp_path / "mamba"
    d.mkdir()
    hf_cfg = json.loads(hf.config.to_json_string())
    hf_cfg["architectures"] = ["MambaForCausalLM"]
    with open(d / "config.json", "w") as f:
        json.dump(hf_cfg, f)
    save_file({k: v.contiguous() for k, v in hf.state_dict().items()
               if k != "lm_head.weight"},
              str(d / "model.safetensors"))

    llm = LLM(model=str(d), dtype="float32", max_model_len=128,
              max_num_seqs=2, max_num_batched_tokens=64, num_kv_blocks=8,
              skip_tokenizer_init=True)
    rng = np.random.default_rng(2)
    prompts = [rng.integers(1, 256, size=n).tolist() for n in (11, 6)]
    params = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True)
    outs = [o.outputs[0].token_ids for o in llm.generate(prompts, params)]

    hf.generation_config.eos_token_id = None
    for prompt, got in zip(prompts, outs):
        with torch.no_grad():
            ref = hf.generate(torch.tensor([prompt]), do_sample=False,
                              max_new_tokens=8)[0, len(prompt):].tolist()
        assert got == ref


def test_falcon_mamba_prefill_matches_hf():
    """FalconMamba: Mamba-1 + weightless RMS on dt/B/C in the mixer."""
    from transformers import FalconMambaConfig as HFFMCfg
    from transformers import FalconMambaForCausalLM

    torch.manual_seed(3)
    hf = FalconMambaForCausalLM(HFFMCfg(
        vocab_size=256, hidden_size=64, state_size=8,
        num_hidden_layers=2, expand=2, conv_kernel=4,
        tie_word_embeddings=True)).eval().float()
    cfg = mamba.FalconMambaConfig.from_hf_config(
        json.loads(hf.config.to_json_string()))
    assert cfg.mixer_rms_eps > 0
    params = mamba.params_from_hf_state_dict(
        cfg, torch_state_dict_reader(hf.state_dict()), dtype=jnp.float32)
    rng = np.random.default_rng(3)
    ids = rng.integers(1, 256, size=23).tolist()
    states = jnp.zeros((cfg.num_hidden_layers, 4, cfg.state_row_width),
                       jnp.float32)
    md = seq_md([ids], slots=[1])
    hidden, _ = mamba.forward(
        params, cfg, TriangleMixConfig(),
        jnp.asarray(ids, jnp.int32), states, md,
        jnp.zeros(cfg.num_hidden_layers, bool))
    ours = np.asarray(mamba.compute_logits(params, cfg, hidden))
    with torch.no_grad():
        ref = hf(torch.tensor([ids])).logits[0].numpy()
    np.testing.assert_allclose(ours, ref, atol=5e-4, rtol=5e-3)
