"""Name-shim families without an installed HF implementation (InternLM2,
Baichuan-7B, Xverse, InternLM-v1, EXAONE, MiniCPM, Orion): these are
semantically the tested llama/decoder paths under different checkpoint
names, so parity is checked by RENAMING a tiny llama checkpoint into
each family's scheme and asserting token-identical engine output to the
llama-served original (reference name maps: vllm internlm2.py,
baichuan.py, exaone.py, minicpm.py, orion.py, registry.py aliases)."""

import json
import os

import pytest

torch = pytest.importorskip("torch")


GEOM = dict(vocab_size=256, hidden_size=64, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2, max_position_embeddings=256,
            rms_norm_eps=1e-6, rope_theta=10_000.0,
            tie_word_embeddings=False, eos_token_id=3, bos_token_id=2)


def build_llama(tmp, kv_heads=2, bias=False):
    from transformers import LlamaConfig, LlamaForCausalLM

    torch.manual_seed(0)
    hf = LlamaForCausalLM(LlamaConfig(
        **{**GEOM, "num_key_value_heads": kv_heads,
           "attention_bias": bias})).eval().float()
    return hf


def save(dirpath, state, cfg):
    from safetensors.torch import save_file

    os.makedirs(dirpath, exist_ok=True)
    save_file({k: v.contiguous() for k, v in state.items()},
              os.path.join(dirpath, "model.safetensors"))
    with open(os.path.join(dirpath, "config.json"), "w") as f:
        json.dump(cfg, f)


def generate(model_dir):
    from vllm_trianglemix_tpu.entrypoints.llm import LLM
    from vllm_trianglemix_tpu.sampling_params import SamplingParams

    llm = LLM(model=model_dir, dtype="float32", max_model_len=128,
              max_num_seqs=2, max_num_batched_tokens=64, num_kv_blocks=32,
              skip_tokenizer_init=True)
    outs = llm.generate([[5, 17, 101, 9]],
                        SamplingParams(temperature=0.0, max_tokens=8,
                                       ignore_eos=True))
    return list(outs[0].outputs[0].token_ids)


def llama_reference(tmp_path, hf, cfg_extra=None):
    d = os.path.join(str(tmp_path), "llama")
    cfg = json.loads(hf.config.to_json_string())
    cfg["architectures"] = ["LlamaForCausalLM"]
    if cfg_extra:
        cfg.update(cfg_extra)
    save(d, hf.state_dict(), cfg)
    return generate(d)


def test_internlm2_rename_parity(tmp_path):
    hf = build_llama(tmp_path)
    sd = dict(hf.state_dict())
    out = {"model.tok_embeddings.weight": sd.pop("model.embed_tokens.weight"),
           "model.norm.weight": sd.pop("model.norm.weight"),
           "output.weight": sd.pop("lm_head.weight")}
    kh, g, dh, d = 2, 2, 16, 64
    for i in range(GEOM["num_hidden_layers"]):
        p = f"model.layers.{i}"
        q = sd.pop(f"{p}.self_attn.q_proj.weight").reshape(kh, g, dh, d)
        k = sd.pop(f"{p}.self_attn.k_proj.weight").reshape(kh, 1, dh, d)
        v = sd.pop(f"{p}.self_attn.v_proj.weight").reshape(kh, 1, dh, d)
        wqkv = torch.cat([q, k, v], dim=1).reshape(kh * (g + 2) * dh, d)
        out[f"{p}.attention.wqkv.weight"] = wqkv
        out[f"{p}.attention.wo.weight"] = sd.pop(
            f"{p}.self_attn.o_proj.weight")
        out[f"{p}.attention_norm.weight"] = sd.pop(
            f"{p}.input_layernorm.weight")
        out[f"{p}.ffn_norm.weight"] = sd.pop(
            f"{p}.post_attention_layernorm.weight")
        out[f"{p}.feed_forward.w1.weight"] = sd.pop(
            f"{p}.mlp.gate_proj.weight")
        out[f"{p}.feed_forward.w3.weight"] = sd.pop(
            f"{p}.mlp.up_proj.weight")
        out[f"{p}.feed_forward.w2.weight"] = sd.pop(
            f"{p}.mlp.down_proj.weight")
    assert not sd, sd.keys()
    d2 = os.path.join(str(tmp_path), "internlm2")
    save(d2, out, dict(GEOM, architectures=["InternLM2ForCausalLM"],
                       bias=False))
    assert generate(d2) == llama_reference(tmp_path, hf)


def test_baichuan_wpack_parity(tmp_path):
    hf = build_llama(tmp_path, kv_heads=4)      # Baichuan is MHA
    sd = dict(hf.state_dict())
    out = {}
    for k, v in list(sd.items()):
        if ".self_attn.q_proj." in k:
            p = k.rsplit(".self_attn.", 1)[0]
            out[f"{p}.self_attn.W_pack.weight"] = torch.cat([
                sd[f"{p}.self_attn.q_proj.weight"],
                sd[f"{p}.self_attn.k_proj.weight"],
                sd[f"{p}.self_attn.v_proj.weight"]])
        elif ".self_attn.k_proj." in k or ".self_attn.v_proj." in k:
            continue
        else:
            out[k] = v
    d2 = os.path.join(str(tmp_path), "baichuan")
    save(d2, out, dict(GEOM, num_key_value_heads=4,
                       architectures=["BaiChuanForCausalLM"]))
    assert generate(d2) == llama_reference(tmp_path, hf)


def test_xverse_alias_parity(tmp_path):
    hf = build_llama(tmp_path)
    d2 = os.path.join(str(tmp_path), "xverse")
    save(d2, hf.state_dict(),
         dict(GEOM, architectures=["XverseForCausalLM"]))
    assert generate(d2) == llama_reference(tmp_path, hf)


def test_internlm_v1_bias_parity(tmp_path):
    hf = build_llama(tmp_path, bias=True)
    d2 = os.path.join(str(tmp_path), "internlm")
    save(d2, hf.state_dict(),
         dict(GEOM, architectures=["InternLMForCausalLM"], bias=True))
    assert generate(d2) == llama_reference(tmp_path, hf)


def test_exaone_rename_parity(tmp_path):
    hf = build_llama(tmp_path)
    ren = {
        "model.embed_tokens.weight": "transformer.wte.weight",
        "model.norm.weight": "transformer.ln_f.weight",
        "lm_head.weight": "lm_head.weight",
    }
    out = {}
    for k, v in hf.state_dict().items():
        if k in ren:
            out[ren[k]] = v
            continue
        nk = (k.replace("model.layers.", "transformer.h.")
               .replace(".input_layernorm.", ".ln_1.")
               .replace(".post_attention_layernorm.", ".ln_2.")
               .replace(".self_attn.q_proj.", ".attn.attention.q_proj.")
               .replace(".self_attn.k_proj.", ".attn.attention.k_proj.")
               .replace(".self_attn.v_proj.", ".attn.attention.v_proj.")
               .replace(".self_attn.o_proj.", ".attn.attention.out_proj.")
               .replace(".mlp.gate_proj.", ".mlp.c_fc_0.")
               .replace(".mlp.up_proj.", ".mlp.c_fc_1.")
               .replace(".mlp.down_proj.", ".mlp.c_proj."))
        out[nk] = v
    d2 = os.path.join(str(tmp_path), "exaone")
    cfg = dict(GEOM, architectures=["ExaoneForCausalLM"],
               activation_function="silu", layer_norm_epsilon=1e-6)
    cfg["num_layers"] = cfg.pop("num_hidden_layers")
    save(d2, out, cfg)
    assert generate(d2) == llama_reference(tmp_path, hf)


def test_minicpm_scales_map_and_neutral_parity(tmp_path):
    from vllm_trianglemix_tpu.models.minicpm import MiniCPMConfig

    cfg = MiniCPMConfig.from_hf_config(dict(
        GEOM, architectures=["MiniCPMForCausalLM"], scale_emb=12.0,
        scale_depth=1.4, dim_model_base=32))
    assert cfg.embedding_multiplier == 12.0
    assert cfg.residual_multiplier == pytest.approx(1.4 / 2 ** 0.5)
    assert cfg.logits_scaling == pytest.approx(64 / 32)

    # with neutral scales MiniCPM IS llama
    hf = build_llama(tmp_path)
    d2 = os.path.join(str(tmp_path), "minicpm")
    save(d2, hf.state_dict(),
         dict(GEOM, architectures=["MiniCPMForCausalLM"]))
    assert generate(d2) == llama_reference(tmp_path, hf)


def test_orion_config_and_smoke(tmp_path):
    """No HF class installed and the LayerNorm semantics differ from
    llama, so: knob-mapping asserts (layernorm path is HF-parity tested
    via StarCoder2) + an engine smoke on random weights."""
    from vllm_trianglemix_tpu.entrypoints.llm import LLM
    from vllm_trianglemix_tpu.models.orion import OrionConfig
    from vllm_trianglemix_tpu.sampling_params import SamplingParams

    cfg = OrionConfig.from_hf_config(dict(
        GEOM, architectures=["OrionForCausalLM"]))
    assert cfg.norm_type == "layernorm" and cfg.norm_bias

    d = os.path.join(str(tmp_path), "orion")
    os.makedirs(d)
    with open(os.path.join(d, "config.json"), "w") as f:
        json.dump(dict(GEOM, architectures=["OrionForCausalLM"]), f)
    llm = LLM(model=d, dtype="float32", max_model_len=128, max_num_seqs=2,
              max_num_batched_tokens=64, num_kv_blocks=32,
              skip_tokenizer_init=True, load_format="dummy")
    outs = llm.generate([[5, 6]], SamplingParams(temperature=0.0,
                                                 max_tokens=4,
                                                 ignore_eos=True))
    assert len(outs[0].outputs[0].token_ids) == 4
