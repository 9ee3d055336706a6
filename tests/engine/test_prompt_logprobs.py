"""Prompt logprobs (VERDICT r3 missing #2): HF parity + API semantics.

Reference: SamplingParams.prompt_logprobs + the v1 logprobs assembly
(vllm/v1/engine/output_processor.py). Entry i is the model's logprob of
prompt token i given tokens < i; index 0 is None.
"""

import json
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from vllm_trianglemix_tpu.sampling_params import SamplingParams  # noqa: E402

HF_KW = dict(
    vocab_size=512,
    hidden_size=64,
    intermediate_size=128,
    num_hidden_layers=2,
    num_attention_heads=4,
    num_key_value_heads=2,
    head_dim=16,
    max_position_embeddings=512,
    rope_theta=1_000_000.0,
    rms_norm_eps=1e-6,
    tie_word_embeddings=True,
    attention_bias=False,
    eos_token_id=3,
    bos_token_id=2,
)

PROMPT = [5, 17, 101, 333, 42, 7, 250, 199, 88, 13, 402, 77]


@pytest.fixture(scope="module")
def ckpt_dir(tmp_path_factory):
    from safetensors.torch import save_file
    from transformers import Qwen3Config, Qwen3ForCausalLM

    torch.manual_seed(0)
    model = Qwen3ForCausalLM(Qwen3Config(**HF_KW)).eval().float()
    d = tmp_path_factory.mktemp("plp_qwen3")
    cfg = json.loads(model.config.to_json_string())
    cfg["architectures"] = ["Qwen3ForCausalLM"]
    with open(d / "config.json", "w") as f:
        json.dump(cfg, f)
    state = {k: v.clone().contiguous()
             for k, v in model.state_dict().items()
             if k != "lm_head.weight"}  # tied to embed_tokens
    save_file(state, os.path.join(d, "model.safetensors"))
    return str(d), model


def hf_prompt_logprobs(model, prompt):
    with torch.no_grad():
        logits = model(torch.tensor([prompt])).logits[0]  # [L, V]
    logp = torch.log_softmax(logits.double(), dim=-1)
    # entry for token i comes from row i-1
    return [float(logp[i - 1, prompt[i]]) for i in range(1, len(prompt))]


def make_llm(path, **kw):
    from vllm_trianglemix_tpu.entrypoints.llm import LLM

    return LLM(model=path, dtype="float32", max_model_len=128,
               max_num_seqs=2, num_kv_blocks=32, skip_tokenizer_init=True,
               enable_prefix_caching=True, **kw)


@pytest.mark.parametrize("max_batched", [256, 4])  # 4 => chunked prefill
def test_prompt_logprobs_match_hf(ckpt_dir, max_batched):
    path, hf = ckpt_dir
    llm = make_llm(path, max_num_batched_tokens=max_batched)
    out = llm.generate([PROMPT], SamplingParams(
        max_tokens=2, temperature=0.0, ignore_eos=True,
        prompt_logprobs=3))[0]
    plp = out.prompt_logprobs
    assert plp is not None and len(plp) == len(PROMPT)
    assert plp[0] is None
    ref = hf_prompt_logprobs(hf, PROMPT)
    for i in range(1, len(PROMPT)):
        row = plp[i]
        assert PROMPT[i] in row
        assert row[PROMPT[i]] == pytest.approx(ref[i - 1], abs=2e-4)
        # top-k alternatives present and no better than the max
        assert len(row) >= 3
        assert all(v <= 0.0 + 1e-6 for v in row.values())


def test_prompt_logprobs_zero_k(ckpt_dir):
    path, hf = ckpt_dir
    llm = make_llm(path, max_num_batched_tokens=256)
    out = llm.generate([PROMPT], SamplingParams(
        max_tokens=1, temperature=0.0, ignore_eos=True,
        prompt_logprobs=0))[0]
    plp = out.prompt_logprobs
    assert plp[0] is None
    ref = hf_prompt_logprobs(hf, PROMPT)
    for i in range(1, len(PROMPT)):
        assert set(plp[i].keys()) == {PROMPT[i]}
        assert plp[i][PROMPT[i]] == pytest.approx(ref[i - 1], abs=2e-4)


def test_prompt_logprobs_skips_prefix_cache(ckpt_dir):
    """A second identical request must recompute (prefix-cache hits have
    no logits) and still return full prompt logprobs."""
    path, hf = ckpt_dir
    llm = make_llm(path, max_num_batched_tokens=256)
    p = SamplingParams(max_tokens=1, temperature=0.0, ignore_eos=True,
                       prompt_logprobs=0)
    first = llm.generate([PROMPT], p)[0]
    second = llm.generate([PROMPT], p)[0]
    assert first.prompt_logprobs == second.prompt_logprobs
    assert len(second.prompt_logprobs) == len(PROMPT)


def test_not_requested_is_none(ckpt_dir):
    path, _ = ckpt_dir
    llm = make_llm(path, max_num_batched_tokens=256)
    out = llm.generate([PROMPT], SamplingParams(
        max_tokens=1, temperature=0.0, ignore_eos=True))[0]
    assert out.prompt_logprobs is None
