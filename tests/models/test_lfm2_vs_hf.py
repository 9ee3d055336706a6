"""LFM2 (gated short-conv / attention hybrid) parity vs HuggingFace
torch: engine e2e greedy equality with chunked prefill exercising the
conv-history splice across chunks."""

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
    layer_types=["conv", "full_attention", "conv", "full_attention"],
    conv_L_cache=3,
    conv_bias=False,
    norm_eps=1e-5,
    rope_theta=1_000_000.0,
    tie_word_embeddings=True,
    eos_token_id=3,
    bos_token_id=2,
    pad_token_id=0,
)


@pytest.fixture(scope="module")
def hf_model():
    from transformers import Lfm2Config as HFCfg
    from transformers import Lfm2ForCausalLM

    torch.manual_seed(0)
    return Lfm2ForCausalLM(HFCfg(**HF_KW)).eval().float()


def test_config_layout():
    from vllm_trianglemix_tpu.models.lfm2 import Lfm2Config

    cfg = Lfm2Config.from_hf_config(HF_KW)
    assert cfg.layer_types == ("conv", "full_attention", "conv",
                               "full_attention")
    assert cfg.ff_dim == 256          # auto-adjust: 2/3*128 -> 256-mult
    assert cfg.state_row_width == 64 * 2


def test_engine_e2e_chunked(hf_model, tmp_path):
    from safetensors.torch import save_file

    from vllm_trianglemix_tpu.entrypoints.llm import LLM
    from vllm_trianglemix_tpu.sampling_params import SamplingParams

    d = tmp_path / "lfm2"
    d.mkdir()
    cfg_dict = json.loads(hf_model.config.to_json_string())
    cfg_dict["architectures"] = ["Lfm2ForCausalLM"]
    with open(d / "config.json", "w") as f:
        json.dump(cfg_dict, f)
    save_file({k: v.clone().contiguous()
               for k, v in hf_model.state_dict().items()},
              str(d / "model.safetensors"))

    # chunked prefill: conv history must splice across the chunk gap
    llm = LLM(model=str(d), dtype="float32", max_model_len=64,
              max_num_seqs=2, max_num_batched_tokens=16,
              num_kv_blocks=64, skip_tokenizer_init=True)

    rng = np.random.default_rng(0)
    prompt = rng.integers(4, 512, size=29).tolist()
    out = llm.generate([prompt], SamplingParams(
        temperature=0.0, max_tokens=8, ignore_eos=True))[0]
    got = list(out.outputs[0].token_ids)

    ids = list(prompt)
    with torch.no_grad():
        for _ in range(8):
            ids.append(int(hf_model(
                torch.tensor([ids])).logits[0, -1].argmax()))
    assert got == ids[len(prompt):]

    # two concurrent requests: conv state pages must not interfere
    p2 = rng.integers(4, 512, size=9).tolist()
    outs = llm.generate([prompt, p2], SamplingParams(
        temperature=0.0, max_tokens=6, ignore_eos=True))
    ids2 = list(p2)
    with torch.no_grad():
        for _ in range(6):
            ids2.append(int(hf_model(
                torch.tensor([ids2])).logits[0, -1].argmax()))
    assert list(outs[1].outputs[0].token_ids) == ids2[len(p2):]
