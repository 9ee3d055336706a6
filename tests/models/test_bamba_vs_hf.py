"""Bamba (Mamba-2 / attention hybrid) parity vs HuggingFace torch.

Engine e2e greedy equality exercises the hybrid stack end to end:
per-group block tables, Mamba-2 SSD state paging, chunked-prefill state
splice, partial-rotary GQA attention layers, and per-layer dense MLPs.
"""

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
    attn_layer_indices=[1, 3],
    mamba_n_heads=8,
    mamba_d_head=16,
    mamba_d_state=8,
    mamba_n_groups=2,
    mamba_expand=2,
    mamba_conv_bias=True,
    mamba_proj_bias=False,
    rms_norm_eps=1e-5,
    tie_word_embeddings=False,
    eos_token_id=3,
    bos_token_id=2,
    pad_token_id=0,
)


@pytest.fixture(scope="module")
def hf_model():
    from transformers import BambaConfig as HFCfg
    from transformers import BambaForCausalLM

    torch.manual_seed(0)
    return BambaForCausalLM(HFCfg(**HF_KW)).eval().float()


def test_config_layout():
    from vllm_trianglemix_tpu.models.bamba import BambaConfig

    cfg = BambaConfig.from_hf_config(HF_KW)
    assert cfg.layer_types == ("mamba", "attention", "mamba", "attention")
    assert cfg.d_inner == 128
    assert cfg.conv_dim == 128 + 2 * 2 * 8
    assert cfg.state_row_width == cfg.conv_dim * 3 + 8 * 16 * 8


def test_engine_e2e_chunked(hf_model, tmp_path):
    from safetensors.torch import save_file

    from vllm_trianglemix_tpu.entrypoints.llm import LLM
    from vllm_trianglemix_tpu.sampling_params import SamplingParams

    d = tmp_path / "bamba"
    d.mkdir()
    cfg_dict = json.loads(hf_model.config.to_json_string())
    cfg_dict["architectures"] = ["BambaForCausalLM"]
    with open(d / "config.json", "w") as f:
        json.dump(cfg_dict, f)
    save_file({k: v.clone().contiguous()
               for k, v in hf_model.state_dict().items()},
              str(d / "model.safetensors"))

    # max_num_batched_tokens=16 < prompt length forces CHUNKED prefill,
    # exercising the Mamba-2 state splice across chunks.
    llm = LLM(model=str(d), dtype="float32", max_model_len=64,
              max_num_seqs=2, max_num_batched_tokens=16,
              num_kv_blocks=64, skip_tokenizer_init=True)

    rng = np.random.default_rng(0)
    prompt = rng.integers(4, 512, size=30).tolist()
    out = llm.generate([prompt], SamplingParams(
        temperature=0.0, max_tokens=8, ignore_eos=True))[0]
    got = list(out.outputs[0].token_ids)

    ids = list(prompt)
    with torch.no_grad():
        for _ in range(8):
            logits = hf_model(torch.tensor([ids])).logits
            ids.append(int(logits[0, -1].argmax()))
    assert got == ids[len(prompt):]

    # two concurrent requests: state pages must not interfere
    p2 = rng.integers(4, 512, size=9).tolist()
    outs = llm.generate([prompt, p2], SamplingParams(
        temperature=0.0, max_tokens=6, ignore_eos=True))
    ids2 = list(p2)
    with torch.no_grad():
        for _ in range(6):
            ids2.append(int(hf_model(
                torch.tensor([ids2])).logits[0, -1].argmax()))
    assert list(outs[0].outputs[0].token_ids) == ids[len(prompt):
                                                     len(prompt) + 6]
    assert list(outs[1].outputs[0].token_ids) == ids2[len(p2):]


def test_registered():
    from vllm_trianglemix_tpu.models.registry import resolve_architecture

    module, cfg_cls = resolve_architecture("BambaForCausalLM")
    assert module.__name__.endswith("bamba")
