"""Granite 4.0 hybrid (Mamba-2 / attention + fused MoE + multipliers)
parity vs HuggingFace torch via engine e2e greedy equality."""

import json

import numpy as np
import pytest

torch = pytest.importorskip("torch")

HF_KW = dict(
    vocab_size=512,
    hidden_size=64,
    intermediate_size=128,
    num_hidden_layers=4,
    num_attention_heads=4,
    num_key_value_heads=2,
    layer_types=["mamba", "attention", "mamba", "attention"],
    mamba_n_heads=8,
    mamba_d_head=16,
    mamba_d_state=8,
    mamba_n_groups=1,
    mamba_expand=2,
    mamba_d_conv=4,
    num_local_experts=4,
    num_experts_per_tok=2,
    shared_intermediate_size=32,
    embedding_multiplier=2.0,
    residual_multiplier=0.5,
    attention_multiplier=0.3,
    logits_scaling=2.0,
    rms_norm_eps=1e-5,
    tie_word_embeddings=True,
    eos_token_id=3,
    bos_token_id=2,
    pad_token_id=0,
)


@pytest.fixture(scope="module")
def hf_model():
    from transformers import GraniteMoeHybridConfig as HFCfg
    from transformers import GraniteMoeHybridForCausalLM

    torch.manual_seed(0)
    return GraniteMoeHybridForCausalLM(HFCfg(**HF_KW)).eval().float()


def test_config_layout():
    from vllm_trianglemix_tpu.models.granitemoe_hybrid import (
        GraniteMoeHybridConfig,
    )

    cfg = GraniteMoeHybridConfig.from_hf_config(HF_KW)
    assert cfg.layer_types == ("mamba", "attention", "mamba", "attention")
    assert not cfg.use_rope and cfg.residual_multiplier == 0.5
    assert cfg.num_experts == 4


def test_engine_e2e_chunked(hf_model, tmp_path):
    from safetensors.torch import save_file

    from vllm_trianglemix_tpu.entrypoints.llm import LLM
    from vllm_trianglemix_tpu.sampling_params import SamplingParams

    d = tmp_path / "gmh"
    d.mkdir()
    cfg_dict = json.loads(hf_model.config.to_json_string())
    cfg_dict["architectures"] = ["GraniteMoeHybridForCausalLM"]
    with open(d / "config.json", "w") as f:
        json.dump(cfg_dict, f)
    save_file({k: v.clone().contiguous()
               for k, v in hf_model.state_dict().items()},
              str(d / "model.safetensors"))

    # chunked prefill exercises the Mamba-2 state splice
    llm = LLM(model=str(d), dtype="float32", max_model_len=64,
              max_num_seqs=2, max_num_batched_tokens=16,
              num_kv_blocks=64, skip_tokenizer_init=True)

    rng = np.random.default_rng(0)
    prompt = rng.integers(4, 512, size=27).tolist()
    out = llm.generate([prompt], SamplingParams(
        temperature=0.0, max_tokens=8, ignore_eos=True))[0]
    got = list(out.outputs[0].token_ids)

    ids = list(prompt)
    with torch.no_grad():
        for _ in range(8):
            ids.append(int(hf_model(
                torch.tensor([ids])).logits[0, -1].argmax()))
    assert got == ids[len(prompt):]
