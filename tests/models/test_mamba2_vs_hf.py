"""Mamba-2 (SSD) numerics parity vs HuggingFace.

Pins models/mamba2.py — [z|xBC|dt] projection, conv over x/B/C with
cached history, per-head scalar decay with grouped B/C, gated RMSNorm —
against HF's sequential torch_forward (modeling_mamba2.py).
"""

import json

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
from transformers import Mamba2Config as HFMamba2Config  # noqa: E402
from transformers import Mamba2ForCausalLM  # noqa: E402

from tests.models.test_mamba_vs_hf import seq_md  # noqa: E402
from vllm_trianglemix_tpu.config import TriangleMixConfig  # noqa: E402
from vllm_trianglemix_tpu.models import mamba2  # noqa: E402
from vllm_trianglemix_tpu.models.weights import torch_state_dict_reader  # noqa: E402

BASE = dict(
    vocab_size=256,
    hidden_size=32,
    state_size=16,
    conv_kernel=4,
    num_heads=8,
    head_dim=8,           # intermediate = 64 = expand * hidden
    n_groups=2,
    expand=2,
    num_hidden_layers=2,
    layer_norm_epsilon=1e-5,
    use_bias=False,
    use_conv_bias=True,
    tie_word_embeddings=True,
    chunk_size=8,
)


def build(seed=0):
    torch.manual_seed(seed)
    hf = Mamba2ForCausalLM(HFMamba2Config(**BASE)).eval().float()
    cfg = mamba2.Mamba2Config.from_hf_config(BASE)
    params = mamba2.params_from_hf_state_dict(
        cfg, torch_state_dict_reader(hf.state_dict()), dtype=jnp.float32)
    return hf, cfg, params


def test_mamba2_prefill_matches_hf():
    hf, cfg, params = build()
    assert cfg.conv_dim == 64 + 2 * 2 * 16
    rng = np.random.default_rng(0)
    p1 = rng.integers(1, 256, size=17).tolist()
    p2 = rng.integers(1, 256, size=9).tolist()
    states = jnp.zeros((cfg.num_hidden_layers, 4, cfg.state_row_width),
                       jnp.float32)
    md = seq_md([p1, p2], slots=[1, 2])
    hidden, states = mamba2.forward(
        params, cfg, TriangleMixConfig(),
        jnp.asarray(p1 + p2, jnp.int32), states, md,
        jnp.zeros(cfg.num_hidden_layers, bool))
    ours = np.asarray(mamba2.compute_logits(params, cfg, hidden))
    with torch.no_grad():
        ref1 = hf(torch.tensor([p1])).logits[0].numpy()
        ref2 = hf(torch.tensor([p2])).logits[0].numpy()
    np.testing.assert_allclose(ours[:17], ref1, atol=7e-4, rtol=5e-3)
    np.testing.assert_allclose(ours[17:], ref2, atol=7e-4, rtol=5e-3)


def test_mamba2_chunked_and_decode_match_full():
    hf, cfg, params = build(seed=1)
    rng = np.random.default_rng(1)
    seq = rng.integers(1, 256, size=23).tolist()
    tri = jnp.zeros(cfg.num_hidden_layers, bool)

    states = jnp.zeros((cfg.num_hidden_layers, 4, cfg.state_row_width),
                       jnp.float32)
    md = seq_md([seq], slots=[1])
    hidden_full, _ = mamba2.forward(params, cfg, TriangleMixConfig(),
                                    jnp.asarray(seq, jnp.int32), states,
                                    md, tri)
    full_logits = np.asarray(
        mamba2.compute_logits(params, cfg, hidden_full))

    states = jnp.zeros_like(states)
    outs = []
    done = 0
    for n in (10, 9, 4):
        chunk = seq[done:done + n]
        md_c = seq_md([chunk], slots=[1], chunk_starts=[done])
        hidden, states = mamba2.forward(
            params, cfg, TriangleMixConfig(),
            jnp.asarray(chunk, jnp.int32), states, md_c, tri)
        outs.append(np.asarray(
            mamba2.compute_logits(params, cfg, hidden)))
        done += n
    chunked = np.concatenate(outs)
    np.testing.assert_allclose(chunked, full_logits, atol=7e-4, rtol=5e-3)

    hf.generation_config.eos_token_id = None
    with torch.no_grad():
        ref = hf.generate(torch.tensor([seq]), do_sample=False,
                          max_new_tokens=4)[0, len(seq):].tolist()
    tok = int(full_logits[-1].argmax())
    got = [tok]
    pos = len(seq)
    for _ in range(3):
        md_1 = seq_md([[tok]], slots=[1], chunk_starts=[pos])
        hidden, states = mamba2.forward(
            params, cfg, TriangleMixConfig(),
            jnp.asarray([tok], jnp.int32), states, md_1, tri)
        tok = int(np.asarray(
            mamba2.compute_logits(params, cfg, hidden))[-1].argmax())
        got.append(tok)
        pos += 1
    assert got == ref


def test_mamba2_engine_e2e(tmp_path):
    from safetensors.torch import save_file

    from vllm_trianglemix_tpu.entrypoints.llm import LLM
    from vllm_trianglemix_tpu.sampling_params import SamplingParams

    hf, cfg, _ = build(seed=2)
    d = tmp_path / "mamba2"
    d.mkdir()
    hf_cfg = json.loads(hf.config.to_json_string())
    hf_cfg["architectures"] = ["Mamba2ForCausalLM"]
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
        assert list(got) == ref
