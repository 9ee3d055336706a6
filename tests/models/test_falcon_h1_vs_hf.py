"""Falcon-H1 (parallel Mamba-2 + attention per layer) vs HuggingFace:
engine-e2e greedy equality, chunked prefill, muP multiplier folding,
and the gated-norm variants (mamba_rms_norm x norm_before_gate)."""

import json

import numpy as np
import pytest

torch = pytest.importorskip("torch")

GEOM = dict(vocab_size=256, hidden_size=64, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2, head_dim=16,
            mamba_d_ssm=64, mamba_n_heads=4, mamba_d_state=16,
            mamba_n_groups=2, mamba_d_conv=4,
            max_position_embeddings=256, rms_norm_eps=1e-5,
            rope_theta=100_000.0, tie_word_embeddings=False,
            pad_token_id=0, bos_token_id=1, eos_token_id=2)


def build(tmp_path, name, **over):
    from safetensors.torch import save_file
    from transformers import FalconH1Config, FalconH1ForCausalLM

    kw = dict(GEOM)
    kw.update(over)
    torch.manual_seed(hash(name) % 2**31)
    hf = FalconH1ForCausalLM(FalconH1Config(**kw)).eval().float()
    d = tmp_path / name
    d.mkdir()
    cfg = json.loads(hf.config.to_json_string())
    cfg["architectures"] = ["FalconH1ForCausalLM"]
    with open(d / "config.json", "w") as f:
        json.dump(cfg, f)
    save_file({k: v.clone().contiguous()
               for k, v in hf.state_dict().items()},
              str(d / "model.safetensors"))
    return hf, d


def generate(d, prompt, n=6, **llm_kw):
    from vllm_trianglemix_tpu.entrypoints.llm import LLM
    from vllm_trianglemix_tpu.sampling_params import SamplingParams

    kw = dict(dtype="float32", max_model_len=128, max_num_seqs=2,
              max_num_batched_tokens=64, num_kv_blocks=48,
              skip_tokenizer_init=True)
    kw.update(llm_kw)
    llm = LLM(model=str(d), **kw)
    out = llm.generate([prompt], SamplingParams(
        temperature=0.0, max_tokens=n, ignore_eos=True))[0]
    return list(out.outputs[0].token_ids)


def hf_ref(hf, prompt, n=6):
    with torch.no_grad():
        return hf.generate(input_ids=torch.tensor([prompt]),
                           do_sample=False, max_new_tokens=n,
                           eos_token_id=None)[0, len(prompt):].tolist()


def test_engine_greedy_matches_hf(tmp_path):
    hf, d = build(tmp_path, "plain")
    prompt = list(range(5, 25))
    assert generate(d, prompt) == hf_ref(hf, prompt)


def test_mup_multipliers_fold(tmp_path):
    hf, d = build(tmp_path, "mup",
                  embedding_multiplier=2.0, lm_head_multiplier=0.5,
                  attention_in_multiplier=1.5, key_multiplier=0.75,
                  attention_out_multiplier=1.25,
                  ssm_in_multiplier=0.8, ssm_out_multiplier=1.1,
                  mlp_multipliers=[1.3, 0.7],
                  ssm_multipliers=[1.1, 0.9, 1.2, 0.8, 1.05])
    prompt = list(range(5, 20))
    assert generate(d, prompt) == hf_ref(hf, prompt)


def test_gated_rms_norm_variants(tmp_path):
    for name, flags in (
            ("rms_before", dict(mamba_rms_norm=True,
                                mamba_norm_before_gate=True)),
            ("rms_after", dict(mamba_rms_norm=True,
                               mamba_norm_before_gate=False))):
        hf, d = build(tmp_path, name, **flags)
        prompt = list(range(5, 18))
        assert generate(d, prompt) == hf_ref(hf, prompt), name


def test_chunked_prefill_state_splice(tmp_path):
    hf, d = build(tmp_path, "chunked")
    prompt = list(range(3, 45))        # > max_num_batched_tokens of 16
    got = generate(d, prompt, max_num_batched_tokens=16,
                   max_num_seqs=1)
    assert got == hf_ref(hf, prompt)
