"""Mistral-format checkpoint support: tekken tokenizer round-trips,
params.json config remap, consolidated weight-name shim, and the
engine serving a consolidated-format dense Mistral end to end."""

import base64
import json

import numpy as np
import pytest

torch = pytest.importorskip("torch")

# tekken-style pattern (simplified from the real v3 file)
_PAT = (r"[^\r\n\p{L}\p{N}]?[\p{Lu}\p{Lt}\p{Lm}\p{Lo}\p{M}]*"
        r"[\p{Ll}\p{Lm}\p{Lo}\p{M}]+|[^\r\n\p{L}\p{N}]?"
        r"[\p{Lu}\p{Lt}\p{Lm}\p{Lo}\p{M}]+[\p{Ll}\p{Lm}\p{Lo}\p{M}]*"
        r"|\p{N}|[^\s\p{L}\p{N}]+|\s+")


def _write_tekken(path, num_special=10, vocab_size=256 + 3 + 10):
    ranks = {bytes([b]): b for b in range(256)}
    for bs, r in ((b"th", 256), (b"the", 257), (b"he", 258)):
        ranks[bs] = r
    # pad to the model vocab so every sampled id decodes (real tekken
    # files cover the full id space)
    for r in range(259, vocab_size - num_special):
        ranks[b"\xff" + r.to_bytes(2, "big")] = r
    vocab = [{"rank": r, "token_bytes": base64.b64encode(bs).decode()}
             for bs, r in sorted(ranks.items(), key=lambda kv: kv[1])]
    tek = {
        "config": {"pattern": _PAT,
                   "default_vocab_size": vocab_size,
                   "default_num_special_tokens": num_special,
                   "version": "v3"},
        "special_tokens": [
            {"rank": 0, "token_str": "<unk>", "is_control": True},
            {"rank": 1, "token_str": "<s>", "is_control": True},
            {"rank": 2, "token_str": "</s>", "is_control": True},
        ],
        "vocab": vocab,
    }
    with open(path, "w") as f:
        json.dump(tek, f)


def test_tekken_tokenizer_roundtrip(tmp_path):
    from vllm_trianglemix_tpu.utils.mistral_format import TekkenTokenizer

    p = tmp_path / "tekken.json"
    _write_tekken(p)
    tok = TekkenTokenizer(str(p))
    assert tok.bos_token_id == 1 and tok.eos_token_id == 2
    txt = "the theme breathes, 42!"
    ids = tok.encode(txt)
    assert ids[0] == tok.bos_token_id
    assert all(i >= tok.num_special for i in ids[1:])  # id offset applied
    assert tok.decode(ids) == txt                      # bos skipped
    assert tok.decode(ids, skip_special_tokens=False) == "<s>" + txt
    # merges actually fire: "the" should use the rank-257 merge
    assert (257 + tok.num_special) in ids


def test_params_json_remap():
    from vllm_trianglemix_tpu.utils.mistral_format import (
        params_json_to_hf_config,
    )

    hf = params_json_to_hf_config(dict(
        dim=64, n_layers=2, n_heads=4, n_kv_heads=2, hidden_dim=128,
        norm_eps=1e-5, vocab_size=512, rope_theta=10_000.0,
        head_dim=16))
    assert hf["architectures"] == ["MistralForCausalLM"]
    assert hf["hidden_size"] == 64 and hf["intermediate_size"] == 128
    assert hf["num_key_value_heads"] == 2

    moe = params_json_to_hf_config(dict(
        dim=64, n_layers=2, n_heads=4, hidden_dim=128, vocab_size=512,
        moe={"num_experts": 8, "num_experts_per_tok": 2}))
    assert moe["architectures"] == ["MixtralForCausalLM"]
    assert moe["num_local_experts"] == 8


def _consolidated_state_dict(hf):
    """HF MistralForCausalLM state dict → consolidated names."""
    ren = {
        "model.embed_tokens.weight": "tok_embeddings.weight",
        "model.norm.weight": "norm.weight",
        "lm_head.weight": "output.weight",
    }
    leaf = {
        "self_attn.q_proj.weight": "attention.wq.weight",
        "self_attn.k_proj.weight": "attention.wk.weight",
        "self_attn.v_proj.weight": "attention.wv.weight",
        "self_attn.o_proj.weight": "attention.wo.weight",
        "input_layernorm.weight": "attention_norm.weight",
        "post_attention_layernorm.weight": "ffn_norm.weight",
        "mlp.gate_proj.weight": "feed_forward.w1.weight",
        "mlp.up_proj.weight": "feed_forward.w3.weight",
        "mlp.down_proj.weight": "feed_forward.w2.weight",
    }
    out = {}
    for k, v in hf.state_dict().items():
        if k in ren:
            out[ren[k]] = v
        else:
            pre, _, rest = k.partition(".layers.")
            i, _, lf = rest.partition(".")
            out[f"layers.{i}.{leaf[lf]}"] = v
    return out


def test_consolidated_engine_e2e(tmp_path):
    """params.json + consolidated.safetensors + tekken.json serve
    through the LLM API and match HF greedy tokens."""
    from safetensors.torch import save_file
    from transformers import MistralConfig as HFCfg
    from transformers import MistralForCausalLM

    from vllm_trianglemix_tpu.entrypoints.llm import LLM
    from vllm_trianglemix_tpu.sampling_params import SamplingParams

    torch.manual_seed(0)
    hf = MistralForCausalLM(HFCfg(
        vocab_size=512, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, head_dim=16,
        rope_theta=10_000.0)).eval().float()

    d = tmp_path / "mistral_native"
    d.mkdir()
    with open(d / "params.json", "w") as f:
        json.dump(dict(dim=64, n_layers=2, n_heads=4, n_kv_heads=2,
                       hidden_dim=128, head_dim=16, norm_eps=1e-6,
                       vocab_size=512, rope_theta=10_000.0), f)
    _write_tekken(d / "tekken.json", vocab_size=512)
    save_file({k: v.clone().contiguous()
               for k, v in _consolidated_state_dict(hf).items()},
              str(d / "consolidated.safetensors"))

    llm = LLM(model=str(d), dtype="float32", max_model_len=128,
              max_num_seqs=2, max_num_batched_tokens=64, num_kv_blocks=32)
    prompt = [5, 17, 101, 9]
    out = llm.generate([prompt], SamplingParams(
        temperature=0.0, max_tokens=8, ignore_eos=True))[0]
    got = list(out.outputs[0].token_ids)
    with torch.no_grad():
        ref = hf.generate(input_ids=torch.tensor([prompt]),
                          do_sample=False, max_new_tokens=8,
                          eos_token_id=None)[0, len(prompt):].tolist()
    assert got == ref

    # text path through the tekken tokenizer
    out2 = llm.generate(["the theme"], SamplingParams(
        temperature=0.0, max_tokens=4, ignore_eos=True))[0]
    assert len(out2.outputs[0].token_ids) == 4
    assert isinstance(out2.outputs[0].text, str)
